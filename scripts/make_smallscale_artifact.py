"""Full-scale small-scale-benchmark reproduction artifact on synthetic data.

Runs run_smallscale.py VERBATIM (reference hyperparameters: 5 datasets x
5 iterations, batch 10, T=50/stride 1, M=20, S=50, lr 0.1, per-dataset
(lambda_1, k_factor), epochs = ceil(30000 / n_windows) — reference
run/run_smallscale.py:12-16,35-59,81) with `vmap_seeds=True` — all five
seeds of each dataset as one vmapped device program — against synthetic
stand-ins staged under the real filenames (the real Actuator/Ballbeam/
Drive/Furnace/Dryer downloads are unavailable: zero-egress environment).

Each stand-in is a LEARNABLE SISO dynamical system (not white noise)
with the published sample counts and file formats
(cbfssm_tpu/data/system_id_tasks.py:129-152), so the resulting RMSEs
are meaningful for the pipeline, though not comparable to the paper's
tables.

Usage: python scripts/make_smallscale_artifact.py [iterations] [train_iterations]
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


def _pwc_input(rng, n, hold=20, lo=-1.0, hi=1.0):
    """Piecewise-constant random input, the classic sys-id excitation."""
    steps = rng.uniform(lo, hi, size=(n // hold + 1,))
    return np.repeat(steps, hold)[:n]


def synth_actuator(path, n=1024, seed=0):
    """actuator.mat {u, p}: hydraulic-actuator-like — pressure is a
    damped 2nd-order response to valve opening with a tanh saturation."""
    rng = np.random.default_rng(seed)
    u = _pwc_input(rng, n, hold=15)
    p = np.zeros(n)
    x = v = 0.0
    for i in range(n):
        a = 4.0 * np.tanh(u[i]) - 0.7 * v - 2.5 * x
        v += 0.1 * a
        x += 0.1 * v
        p[i] = x
    p += 0.02 * rng.normal(size=n)
    scipy.io.savemat(path, {"u": u[:, None], "p": p[:, None]})


def synth_2col_siso(path, n, seed, csv=False, gain=1.0, damp=0.85,
                    nonlin=np.tanh, hold=20, noise=0.02):
    """Two-column (u, y) file: first-order nonlinear lag
    y[t+1] = damp*y[t] + gain*nonlin(u[t]) + noise."""
    rng = np.random.default_rng(seed)
    u = _pwc_input(rng, n, hold=hold)
    y = np.zeros(n)
    acc = 0.0
    for i in range(n):
        acc = damp * acc + gain * nonlin(u[i])
        y[i] = acc
    y += noise * rng.normal(size=n)
    data = np.stack([u, y], axis=1)
    if csv:
        np.savetxt(path, data, delimiter=",", header="u,y", comments="")
    else:
        np.savetxt(path, data)


def synth_drive(path, n=500, seed=3):
    """drive.mat {u1, z1}: nonlinear two-mass drive — output depends on
    the squared input sign-preservingly (Wiener-like)."""
    rng = np.random.default_rng(seed)
    u = _pwc_input(rng, n, hold=10)
    z = np.zeros(n)
    x1 = x2 = 0.0
    for i in range(n):
        drive = np.sign(u[i]) * u[i] ** 2
        x1 = 0.7 * x1 + 0.4 * drive
        x2 = 0.8 * x2 + 0.5 * x1
        z[i] = x2
    z += 0.02 * rng.normal(size=n)
    scipy.io.savemat(path, {"u1": u[:, None], "z1": z[:, None]})


def stage_all(data_dir):
    synth_actuator(data_dir + "actuator.mat", n=1024, seed=0)
    # published sizes: ballbeam 1000 (split 500), furnace 296 (split
    # 148), dryer 1000 (split 500) — system_id_tasks.py:7-11
    synth_2col_siso(data_dir + "ballbeam.dat", 1000, seed=1, damp=0.9,
                    gain=0.5, hold=25)
    synth_drive(data_dir + "drive.mat", n=500, seed=3)
    synth_2col_siso(data_dir + "gas_furnace.csv", 296, seed=4, csv=True,
                    damp=0.8, gain=1.5, hold=12)
    synth_2col_siso(data_dir + "dryer.dat", 1000, seed=5, damp=0.75,
                    gain=2.0, nonlin=lambda x: x + 0.3 * x**3, hold=30)


def main():
    iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    train_iterations = int(sys.argv[2]) if len(sys.argv) > 2 else 30000

    data_dir = tempfile.mkdtemp() + "/"
    stage_all(data_dir)

    from scripts.driver_util import load_driver

    mod = load_driver("run_smallscale.py")

    out = os.path.join(HERE, "run_output", "smallscale_vmapped")
    total0 = time.perf_counter()
    times = {}
    for task_nr, name in enumerate(n for _, n, _, _ in mod.datasets):
        t0 = time.perf_counter()
        mod.main(
            task_list=[task_nr],
            root=out,
            iterations=iterations,
            train_iterations=train_iterations,
            data_dir=data_dir,
            vmap_seeds=True,
        )
        times[name] = time.perf_counter() - t0
        print(f"=== {name}: {times[name]:.1f} s ===")
    wall = time.perf_counter() - total0
    print(f"TOTAL WALL: {wall:.1f} s for 5 datasets x {iterations} seeds")

    art = os.path.join(HERE, "artifacts", "smallscale_vmapped")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "walltime.txt"), "w") as f:
        for name, dt in times.items():
            f.write(f"{name}: {dt:.1f} s\n")
        f.write(f"total: {wall:.1f} s\n")
    for name in times:
        dst = os.path.join(art, name)
        os.makedirs(dst, exist_ok=True)
        src_root = os.path.join(out, name)
        for f in ["summary.txt"]:
            if os.path.exists(os.path.join(src_root, f)):
                shutil.copy(os.path.join(src_root, f), dst)
        for f in ["mse.txt", "training_loss.pdf", "predict_test.pdf",
                  "calibration.txt"]:
            src = os.path.join(src_root, "run_0", f)
            if os.path.exists(src):
                shutil.copy(src, dst)
    print("artifacts:", sorted(os.listdir(art)))


if __name__ == "__main__":
    main()
