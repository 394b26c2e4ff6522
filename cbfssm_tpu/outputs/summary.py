"""Multi-run RMSE aggregation.

Capability parity with reference cbfssm/outputs/output_summary.py:7-31:
copies the invoking script into the output directory (provenance
snapshot) and writes per-run / mean / std RMSE to summary.txt.
"""

from __future__ import annotations

import os
import sys
from shutil import copyfile

import numpy as np


class OutputSummary:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.rmse_all = []
        os.makedirs(out_dir, exist_ok=True)
        script = os.path.abspath(sys.argv[0])
        if os.path.isfile(script):
            copyfile(script, os.path.join(out_dir, "main.py"))

    def add_outputs(self, outputs):
        self.rmse_all.append(outputs.get_last_rmse())

    def write_summary(self):
        if not self.rmse_all or self.rmse_all[0] is None:
            print("RMSE summary skipped")
            return
        rmse = np.asarray(self.rmse_all, dtype=np.float64)
        with open(os.path.join(self.out_dir, "summary.txt"), "w") as f:
            f.write("RMSE\n====\n\n")
            f.write("Runs:\n")
            for val in rmse:
                f.write("  %f\n" % val)
            f.write("Mean: %f\n" % np.mean(rmse))
            f.write("Std:  %f\n" % np.std(rmse))
