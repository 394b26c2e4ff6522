"""Train every PR-SSM recognition variant end-to-end on SpringNonlinear.

The three recognition models ('output', 'conv', 'rnn' — reference
prssm.py:140-169, incl. the conv variant's recog_len==16 flatten
constraint) are golden-tested at the ELBO level; this script provides
the end-to-end evidence row: same data, same budget, free-running test
RMSE per variant (BENCHMARKS.md "CBFSSMHALF and PR-SSM on real
generated data").

Usage: python scripts/train_prssm_variants.py [epochs]
"""

import os
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from cbfssm_tpu.data import SpringNonlinear  # noqa: E402
from cbfssm_tpu.models import PRSSM  # noqa: E402
from cbfssm_tpu.outputs import Outputs  # noqa: E402
from cbfssm_tpu.training import Trainer  # noqa: E402


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    ds = SpringNonlinear(50, 1)
    dim_x = 4
    for recog in ("rnn", "conv", "output"):
        config = {
            "ds": SpringNonlinear,
            "batch_size": 10,
            "shuffle": 10000,
            "dim_x": dim_x,
            "ind_pnt_num": 20,
            "samples": 50,
            "learning_rate": 0.1,
            "loss_factors": np.asarray([1.0, 0.0]),
            "recog_len": 16,  # conv flatten hardcodes 16 (prssm.py:151-153)
            "recog_model": recog,
            "zeta_pos": 2.0,
            "zeta_mean": 0.05**2,
            "zeta_var": 0.01**2,
            "var_x": np.asarray([0.002**2] * dim_x),
            "var_y": np.asarray([1.0**2] * SpringNonlinear.dim_y),
            "gp_var": 0.5**2,
            "gp_len": 2.0,
        }
        out = tempfile.mkdtemp(prefix=f"prssm_{recog}_")
        model = PRSSM(config)
        trainer = Trainer(model, out, seed=0)
        t0 = time.perf_counter()
        trainer.train(ds, epochs)
        wall = time.perf_counter() - t0
        o = Outputs(out)
        o.set_ds(ds)
        o.set_model(model, out)
        o.set_trainer(trainer)
        o.create_all()
        print(
            f"RESULT recog={recog:7s} free-run test RMSE "
            f"{o.get_last_rmse():.4f}  ({epochs} epochs, {wall:.0f}s train)"
        )


if __name__ == "__main__":
    main()
