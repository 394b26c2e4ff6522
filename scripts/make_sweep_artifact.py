"""Tuning-surface artifact: SweepTrainer on the synthetic Actuator.

The reference's per-dataset (lambda_1, k_factor) pairs
(run/run_smallscale.py:12-16) were the product of serial trial runs.
This script tunes the same two hypers on the synthetic actuator
stand-in as ONE vmapped grid (full reference training budget per
point), then evaluates every point's free-running test RMSE — the
complete tuning surface, for roughly the cost of training one point
serially per few grid points.

Writes artifacts/sweep_actuator/{grid_rmse.txt, sweep_best.json}.

Usage: python scripts/make_sweep_artifact.py [epochs]
"""

import json
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

    dim_x = 4
    config = {
        "ds": Actuator,
        "batch_size": 10,
        "shuffle": 10000,
        "dim_x": dim_x,
        "ind_pnt_num": 20,
        "samples": 50,
        "learning_rate": 0.1,
        "loss_factors": np.asarray([0.5, 0.0]),
        "k_factor": 100.0,
        "recog_len": 16,
        "zeta_pos": 2.0,
        "zeta_mean": 0.05**2,
        "zeta_var": 0.01**2,
        "var_x": np.asarray([0.002**2] * dim_x),
        "var_y": np.asarray([1.0**2] * dim_x),
        "gp_var": 0.5**2,
        "gp_len": 2.0,
    }

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

    # free-running test RMSE per grid point (Outputs' mse.txt semantics)
    rows = []
    for i, (lam, k) in enumerate(points):
        o = Outputs(os.path.join(out, f"pt_{i}"))
        o.set_ds(ds)
        o.set_model(trainer.model, out)
        o.set_trainer(trainer.seed_view(i))
        o.create_all()
        rows.append((lam, k, o.get_last_rmse()))
    eval_wall = time.perf_counter() - t0 - train_wall

    art = os.path.join(HERE, "artifacts", "sweep_actuator")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "grid_rmse.txt"), "w") as f:
        f.write(
            f"# {len(points)}-point (lambda_1, k_factor) grid, one vmapped "
            f"program\n# train {train_wall:.0f}s ({epochs} epochs), "
            f"eval {eval_wall:.0f}s\n"
            "lambda_1  k_factor  free_run_test_RMSE\n"
        )
        for lam, k, rmse in sorted(rows, key=lambda r: r[2]):
            f.write(f"{lam:8.2f}  {k:8.0f}  {rmse:.6f}\n")
    shutil.copy(os.path.join(out, "sweep_best.json"), art)
    print(open(os.path.join(art, "grid_rmse.txt")).read())
    print(f"best by train loss: {trainer.best_config()}")
    print(f"TOTAL WALL: {time.perf_counter() - t0:.1f} s")


if __name__ == "__main__":
    main()
