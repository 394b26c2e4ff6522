"""Multi-run RMSE aggregation.

Capability parity with reference cbfssm/outputs/output_summary.py:7-31:
copies the invoking script into the output directory (provenance
snapshot) and writes per-run / mean / std RMSE to summary.txt — plus,
beyond the reference, per-run predictive NLL and 95%-band coverage
when the runs produced calibration stats (outputs/calibration.py).
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
        self.calibration_all = []
        os.makedirs(out_dir, exist_ok=True)
        script = os.path.abspath(sys.argv[0])
        if os.path.isfile(script):
            copyfile(script, os.path.join(out_dir, "main.py"))

    def add_outputs(self, outputs):
        self.rmse_all.append(outputs.get_last_rmse())
        self.calibration_all.append(
            getattr(outputs, "last_calibration", None)
        )

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
            if all(c is not None for c in self.calibration_all):
                nll = np.asarray(
                    [c["nll"] for c in self.calibration_all], dtype=np.float64
                )
                cov = np.asarray(
                    [c["coverage"].get(0.95, np.nan)
                     for c in self.calibration_all],
                    dtype=np.float64,
                )
                f.write("\nNLL/point\n=========\n\n")
                f.write("Runs:\n")
                for val in nll:
                    f.write("  %f\n" % val)
                f.write("Mean: %f\n" % np.mean(nll))
                f.write("Std:  %f\n" % np.std(nll))
                f.write("\n95%%-band coverage mean: %f\n" % np.mean(cov))


def vmapped_reproduction(model, ds, root, iterations, epochs,
                         outputs_cls=None, metrics_path=None):
    """The multi-iteration reproduction flow with all seeds trained as
    ONE vmapped device program: MultiSeedTrainer + per-seed Outputs into
    run_i/ directories + summary.txt — the same artifact layout the
    serial loop produces. Shared by the run drivers' vmap_seeds mode."""
    from cbfssm_tpu.outputs.outputs import Outputs
    from cbfssm_tpu.training import MultiSeedTrainer

    outputs_cls = outputs_cls or Outputs
    summary = OutputSummary(root)
    trainer = MultiSeedTrainer(model, root, n_seeds=iterations,
                               metrics_path=metrics_path)
    trainer.train(ds, epochs)
    for it in range(iterations):
        out_dir = root if iterations == 1 else root + "/run_%d" % it
        outputs = outputs_cls(out_dir)
        outputs.set_ds(ds)
        outputs.set_model(model, root)
        outputs.set_trainer(trainer.seed_view(it))
        outputs.create_all()
        summary.add_outputs(outputs)
    summary.write_summary()
    return summary
