"""End-to-end execution of every reproduction driver's main() on
synthetic fixtures staged under the real filenames — the full
config → dataset → train → outputs → summary flow at 1 epoch.

These are the user-facing product; import-only smoke tests (see
test_run_scripts.py) would not catch a config-key typo or a broken
artifact path. Mirrors reference run/run_smallscale.py:66-92 flow.
"""

import os

import numpy as np
import pytest
import scipy.io

from cbfssm_tpu.data import DSManager
from scripts.driver_util import load_driver


FAST = {"samples": 2, "ind_pnt_num": 5, "batch_size": 4, "recog_len": 4}


@pytest.fixture
def sysid_dir(tmp_path, rng):
    d = str(tmp_path) + "/"
    scipy.io.savemat(
        d + "actuator.mat",
        {"u": rng.normal(size=(1024, 1)), "p": rng.normal(size=(1024, 1))},
    )
    scipy.io.savemat(
        d + "sarcos_inv.mat", {"sarcos_inv": rng.normal(size=(674 * 66, 28))}
    )
    for name, du, dy, n in [
        ("robomove.mat", 2, 2, 30000),
        ("spring_nonlinear.mat", 1, 3, 10000),
    ]:
        DSManager.save_ds(
            d + name,
            rng.normal(size=(n, du)),
            rng.normal(size=(n, 3)),
            rng.normal(size=(n, dy)),
            name,
        )
    return d


@pytest.mark.slow
def test_run_smallscale_e2e(sysid_dir, tmp_path):
    mod = load_driver("run_smallscale.py")
    root = str(tmp_path / "out")
    mod.main(
        task_list=[0],  # Actuator
        root=root,
        iterations=1,
        train_iterations=1,
        data_dir=sysid_dir,
        config_overrides=FAST,
        seq_len=20,
        seq_stride=25,
    )
    out = root + "/actuator"
    for f in ["mse.txt", "summary.txt", "var_dump.txt", "predict_test.pdf",
              "training_loss.pdf", "main.py"]:
        assert os.path.exists(os.path.join(out, f)), f
    rmse = float(open(out + "/mse.txt").read().split("RMSE: ")[1])
    assert np.isfinite(rmse)
    # summary aggregates the same rmse
    assert "RMSE" in open(out + "/summary.txt").read()


@pytest.mark.slow
def test_run_sarcos_e2e(sysid_dir, tmp_path):
    mod = load_driver("run_sarcos.py")
    root = str(tmp_path / "out")
    mod.main(
        root=root,
        iterations=1,
        epochs=1,
        data_dir=sysid_dir,
        config_overrides=FAST,
        seq_len=30,
        seq_stride=300,
    )
    assert os.path.exists(root + "/mse.txt")
    assert os.path.exists(root + "/summary.txt")


@pytest.mark.slow
def test_run_robomove_e2e(sysid_dir, tmp_path):
    mod = load_driver("run_robomove.py")
    root = str(tmp_path / "out")
    # Both curriculum phases run (phase 1 retrains from the phase-0
    # checkpoint), each at 1 epoch.
    mod.main(
        root=root,
        epochs=1,
        data_dir=sysid_dir,
        config_overrides=dict(FAST, recog_len=10),
        seq_len=50,
        seq_stride=5000,
    )
    for f in ["mse.txt", "var_dump.txt", "robomove_train.pdf", "model.ckpt"]:
        assert os.path.exists(os.path.join(root, f)), f


@pytest.mark.slow
def test_run_spring_e2e(sysid_dir, tmp_path):
    mod = load_driver("run_spring.py")
    root = str(tmp_path / "out")
    mod.main(
        root=root,
        iterations=1,
        train_iterations=1,
        data_dir=sysid_dir,
        config_overrides=FAST,
        seq_len=20,
        seq_stride=100,
    )
    assert os.path.exists(root + "/mse.txt")
    assert os.path.exists(root + "/metrics.jsonl")
    assert os.path.exists(root + "/summary.txt")


@pytest.mark.slow
def test_run_spring_vmap_seeds_e2e(sysid_dir, tmp_path):
    """The vmapped multi-seed path produces the same artifact layout as
    the serial loop (per-run dirs + summary)."""
    mod = load_driver("run_spring.py")
    root = str(tmp_path / "out")
    mod.main(
        root=root,
        iterations=2,
        train_iterations=1,
        data_dir=sysid_dir,
        config_overrides=FAST,
        seq_len=20,
        seq_stride=100,
        vmap_seeds=True,
    )
    for it in range(2):
        assert os.path.exists(root + f"/run_{it}/mse.txt")
        assert os.path.exists(root + f"/run_{it}/training_loss.pdf")
    summary = open(root + "/summary.txt").read()
    assert "RMSE" in summary


@pytest.mark.slow
def test_run_voliro_e2e(tmp_path):
    from tests.test_voliro_dataset import make_log

    d = str(tmp_path) + "/"
    make_log(d + "voliro_tilt.mat", n=4000, seed=1)
    make_log(d + "voliro_flip.mat", n=20500, seed=2)
    mod = load_driver("run_voliro.py")
    root = str(tmp_path / "out")
    mod.main(
        root=root,
        epochs=1,
        data_dir=d,
        config_overrides={"samples": 2, "ind_pnt_num": 5, "batch_size": 4},
        seq_len=16,
        seq_stride=500,
    )
    for f in ["voliro_forces.pdf", "var_dump.txt", "training_loss.pdf"]:
        assert os.path.exists(os.path.join(root, f)), f
