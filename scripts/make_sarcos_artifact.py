"""Full-scale Sarcos reproduction artifact on synthetic data.

Runs run_sarcos.py VERBATIM (reference hyperparameters: dim_x=14,
seq 250/stride 10, batch 5, M=100, S=20, 8 epochs, 5 iterations) with
`vmap_seeds=True` — all five seeds as one vmapped device program —
against a synthetic sarcos_inv.mat (real download unavailable:
zero-egress). The synthetic arm is LEARNABLE (positions are a
second-order low-pass response to the torques, not white noise) so the
RMSE numbers are meaningful for the pipeline, though not comparable to
the paper's.

Usage: python scripts/make_sarcos_artifact.py [iterations] [epochs]
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np
import scipy.io

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def synth_sarcos(path, n_exp=66, h=674, seed=0):
    """sarcos_inv.mat layout: [n_exp*674, 28]; cols 0:7 positions,
    21:28 torques. Positions = 2nd-order low-pass of torques with
    per-joint couplings + small noise."""
    rng = np.random.default_rng(seed)
    rows = []
    mix = 0.2 * rng.normal(size=(7, 7)) + np.eye(7)
    for _ in range(n_exp):
        t = np.arange(h)[:, None]
        freqs = rng.uniform(0.005, 0.05, size=(1, 7))
        phases = rng.uniform(0, 2 * np.pi, size=(1, 7))
        torque = np.sin(2 * np.pi * freqs * t + phases) + 0.3 * rng.normal(size=(h, 7))
        pos = np.zeros((h, 7))
        vel = np.zeros(7)
        x = np.zeros(7)
        for i in range(h):
            acc = torque[i] @ mix.T - 0.8 * vel - 2.0 * x
            vel = vel + 0.05 * acc
            x = x + 0.05 * vel
            pos[i] = x
        pos = pos + 0.01 * rng.normal(size=(h, 7))
        block = np.zeros((h, 28))
        block[:, 0:7] = pos
        block[:, 21:28] = torque
        rows.append(block)
    scipy.io.savemat(path, {"sarcos_inv": np.concatenate(rows, axis=0)})


def main():
    iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    data_dir = tempfile.mkdtemp() + "/"
    synth_sarcos(data_dir + "sarcos_inv.mat")

    from scripts.driver_util import load_driver

    mod = load_driver("run_sarcos.py")

    out = os.path.join(HERE, "run_output", "sarcos_vmapped")
    t0 = time.perf_counter()
    mod.main(root=out, iterations=iterations, epochs=epochs,
             data_dir=data_dir, vmap_seeds=True)
    wall = time.perf_counter() - t0
    print(f"TOTAL WALL: {wall:.1f} s for {iterations} seeds x {epochs} epochs")

    art = os.path.join(HERE, "artifacts", "sarcos_vmapped")
    os.makedirs(art, exist_ok=True)
    for f in ["summary.txt"]:
        src = os.path.join(out, f)
        if os.path.exists(src):
            shutil.copy(src, art)
    for f in ["mse.txt", "predict_test.pdf", "training_loss.pdf",
              "calibration.txt"]:
        src = os.path.join(out, "run_0", f)
        if os.path.exists(src):
            shutil.copy(src, art)
    print("artifacts:", sorted(os.listdir(art)))


if __name__ == "__main__":
    main()
