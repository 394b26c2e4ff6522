"""Measure SweepTrainer grid throughput vs the serial alternative.

Small-scale shape (batch 10, T=50, S=50, M=20, f32 — the BENCHMARKS.md
multi-seed section's shape) on synthetic first-order data. Times
steady-state s/epoch for (a) one serial Trainer run and (b) an N-point
(k_factor, lambda_1, learning_rate) grid in one vmapped program; the
serial grid cost is N x (a).

Timing per CLAUDE.md: first epoch discarded (compile + staging),
host-value readbacks inside the trainers provide synchronization.

Usage: python scripts/bench_sweep.py [grid_n] [epochs]
       python scripts/bench_sweep.py --width-curve   (lane-scaling table)
"""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from cbfssm_tpu.data.base import BaseDS  # noqa: E402
from cbfssm_tpu.models import CBFSSM  # noqa: E402
from cbfssm_tpu.training import SweepTrainer, Trainer  # noqa: E402


class SynthDS(BaseDS):
    """First-order SISO system, small-scale windowing (T=50, stride 1)."""

    dim_u = 1
    dim_y = 1

    def __init__(self, seq_len=50, seq_stride=1, n=600, seed=0):
        super().__init__(seq_len, seq_stride)
        rng = np.random.default_rng(seed)
        u = rng.uniform(-1, 1, size=(n, 1))
        x = np.zeros(n)
        for i in range(1, n):
            x[i] = 0.8 * x[i - 1] + 0.3 * np.tanh(u[i - 1, 0])
        y = (x + rng.normal(0, 0.01, size=n))[:, None]
        self.normalize_init(u, y)
        split = int(0.8 * n)
        self.train_in = self.normalize(u, "in")[None, :split]
        self.train_out = self.normalize(y, "out")[None, :split]
        self.test_in = self.normalize(u, "in")[None, split:]
        self.test_out = self.normalize(y, "out")[None, split:]
        self.create_batches()


def config(dim_x=4):
    return {
        "ds": SynthDS,
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
        "dtype": "float32",
    }


def width_curve(epochs=6):
    """s/epoch vs vmapped lane count (MultiSeedTrainer) — how free is
    width on a dependency-chain-bound step?"""
    from cbfssm_tpu.training import MultiSeedTrainer

    ds = SynthDS()
    print("lanes  total_s  s/epoch  s/epoch/lane")
    for n in (1, 2, 5, 10, 20, 40):
        tr = MultiSeedTrainer(CBFSSM(config()), f"/tmp/bench_width_{n}", n_seeds=n)
        t0 = time.perf_counter()
        tr.train(ds, epochs)
        cold = time.perf_counter() - t0
        tr2 = MultiSeedTrainer(CBFSSM(config()), f"/tmp/bench_width_{n}b", n_seeds=n)
        t0 = time.perf_counter()
        tr2.train(ds, epochs)
        warm = time.perf_counter() - t0
        print(f"{n:5d}  {warm:7.2f}  {warm/epochs:7.3f}  {warm/epochs/n:9.4f}"
              f"   (cold {cold:.1f}s)")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--width-curve":
        width_curve()
        return
    grid_n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    ds = SynthDS()
    print(f"windows: train {ds.train_in_batch.shape} test {ds.test_in_batch.shape}")

    def run_serial():
        tr = Trainer(CBFSSM(config()), "/tmp/bench_sweep_serial")
        t0 = time.perf_counter()
        tr.train(ds, epochs)
        return time.perf_counter() - t0

    run_serial()  # cold run: compile + one-time staging

    def run_sweep():
        sweep = {
            "k_factor": np.linspace(10.0, 200.0, grid_n),
            "loss_factors": np.stack(
                [np.linspace(0.05, 1.0, grid_n), np.zeros(grid_n)], axis=1
            ),
            "learning_rate": np.full(grid_n, 0.1),
        }
        tr = SweepTrainer(CBFSSM, config(), sweep, "/tmp/bench_sweep_grid")
        t0 = time.perf_counter()
        tr.train(ds, epochs)
        return time.perf_counter() - t0, tr.best_config()

    serial_warm = run_serial()  # second serial run: XLA cache warm
    sweep_total, best = run_sweep()
    sweep_warm, _ = run_sweep()  # warm rerun

    print(f"\nserial 1-config total ({epochs} ep, warm): {serial_warm:.2f} s")
    print(f"sweep {grid_n}-point total (cold): {sweep_total:.2f} s; warm: {sweep_warm:.2f} s")
    print(f"serial {grid_n}-config estimate: {grid_n * serial_warm:.2f} s")
    print(f"speedup vs serial grid: {grid_n * serial_warm / sweep_warm:.2f}x")
    print(f"best config: {best}")


if __name__ == "__main__":
    main()
