"""Tuning-surface artifact: SweepTrainer on the synthetic Actuator.

The reference's per-dataset (lambda_1, k_factor) pairs
(run/run_smallscale.py:12-16) were the product of serial trial runs.
This script tunes the same two hypers on the synthetic actuator
stand-in as ONE vmapped grid (full reference training budget per
point), ranks every point by free-running test RMSE computed in one
vmapped program (`SweepTrainer.evaluate_rmse`, Outputs.test_mse
semantics), and writes the reference-style evaluation artifacts for the
RMSE-best point only.

Writes artifacts/sweep_actuator/{grid_rmse.txt, sweep_best.json}.

Usage: python scripts/make_sweep_artifact.py [epochs]
"""

import math
import os
import shutil
import sys
import tempfile
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from scripts.make_smallscale_artifact import synth_actuator  # noqa: E402


def load_run_smallscale():
    from scripts.driver_util import load_driver

    return load_driver("run_smallscale.py")


def main():
    from cbfssm_tpu.data import Actuator
    from cbfssm_tpu.models import CBFSSM
    from cbfssm_tpu.outputs import Outputs
    from cbfssm_tpu.training import SweepTrainer

    data_dir = tempfile.mkdtemp() + "/"
    synth_actuator(data_dir + "actuator.mat", n=1024, seed=0)
    ds = Actuator(50, 1, data_dir=data_dir)

    lam_grid = [0.05, 0.15, 0.5]
    k_grid = [10.0, 50.0, 100.0, 200.0]
    points = [(lam, k) for lam in lam_grid for k in k_grid]
    sweep = {
        "loss_factors": np.asarray([[lam, 0.0] for lam, _ in points]),
        "k_factor": np.asarray([k for _, k in points]),
    }

    # the reference's verbatim Actuator config (task 0) is the sweep's
    # base — single source of truth, no duplicated dict
    config = load_run_smallscale().model_config(0)

    epochs = (
        int(sys.argv[1])
        if len(sys.argv) > 1
        else math.ceil(30000 / ds.train_in_batch.shape[0])
    )
    out = os.path.join(HERE, "run_output", "sweep_actuator")
    trainer = SweepTrainer(CBFSSM, config, sweep, out)
    t0 = time.perf_counter()
    trainer.train(ds, epochs)
    train_wall = time.perf_counter() - t0

    # rank the grid by free-running test RMSE — all lanes in one
    # vmapped program (train losses are not comparable across lambda_1)
    rmse = trainer.evaluate_rmse(ds)
    eval_wall = time.perf_counter() - t0 - train_wall
    rows = [(lam, k, rmse[i]) for i, (lam, k) in enumerate(points)]
    best_i = int(np.argmin(rmse))

    # reference-style artifacts for the RMSE-best point
    o = Outputs(os.path.join(out, "best_point"))
    o.set_ds(ds)
    o.set_model(trainer.model, out)
    o.set_trainer(trainer.seed_view(best_i))
    o.create_all()

    art = os.path.join(HERE, "artifacts", "sweep_actuator")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "grid_rmse.txt"), "w") as f:
        f.write(
            f"# {len(points)}-point (lambda_1, k_factor) grid, one vmapped "
            f"program\n# train {train_wall:.0f}s ({epochs} epochs), "
            f"vmapped eval {eval_wall:.0f}s\n"
            "lambda_1  k_factor  free_run_test_RMSE\n"
        )
        for lam, k, r in sorted(rows, key=lambda r: r[2]):
            f.write(f"{lam:8.2f}  {k:8.0f}  {r:.6f}\n")
    shutil.copy(os.path.join(out, "sweep_best.json"), art)
    print(open(os.path.join(art, "grid_rmse.txt")).read())
    print(f"RMSE-best point: lambda_1={points[best_i][0]}, "
          f"k_factor={points[best_i][1]} (RMSE {rmse[best_i]:.4f}, "
          f"Outputs RMSE {o.get_last_rmse():.4f})")
    print(f"best by train loss (not lambda-comparable): {trainer.best_config()}")
    print(f"TOTAL WALL: {time.perf_counter() - t0:.1f} s")


if __name__ == "__main__":
    main()
