"""Voliro flight-log loader + dataset classes on a synthetic PX4-style
.mat fixture (the real logs are not distributable)."""

import numpy as np
import pytest
import scipy.io

from cbfssm_tpu.data.datasets import VoliroFlipDS, VoliroTiltDS
from cbfssm_tpu.data.voliro_loader import _LOG_KEYS, VoliroLog


def make_log(path, n=600, seed=0):
    """Synthetic flight log: smooth sinusoid trajectory + valid
    quaternions; all keys stored as (n, 1) arrays inside a struct (the
    layout scipy produces for the reference's ds_raw[key][0][0])."""
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float64)
    data = {}
    data["TIME_StartTime"] = t * 10_000.0  # microseconds, dt = 0.01 s
    data["LPOS_X"] = np.sin(t * 0.01)
    data["LPOS_Y"] = np.cos(t * 0.013)
    data["LPOS_Z"] = -1.0 + 0.1 * np.sin(t * 0.007)
    data["LPSP_X"] = data["LPOS_X"]
    data["LPSP_Y"] = data["LPOS_Y"]
    data["LPSP_Z"] = data["LPOS_Z"]
    # slowly-varying attitude euler -> quaternion (intrinsic xyz)
    from cbfssm_tpu.utils import rotations

    roll = 0.2 * np.sin(t * 0.01)
    pitch = 0.1 * np.sin(t * 0.008)
    yaw = 0.3 + 0.05 * t * 0.001
    q = rotations.quaternion_from_euler(roll, pitch, yaw)
    data["ATT_qw"], data["ATT_qx"] = q[:, 0], q[:, 1]
    data["ATT_qy"], data["ATT_qz"] = q[:, 2], q[:, 3]
    for i, k in enumerate(["ATSP_qw", "ATSP_qx", "ATSP_qy", "ATSP_qz"]):
        data[k] = q[:, i]
    for j in range(6):
        data[f"OUT0_Out{j+2}"] = rng.uniform(0.3, 0.9, n)
        data[f"OUT1_Out{j}"] = rng.uniform(0.3, 0.9, n)
        data[f"ATC0_Out{j}"] = rng.uniform(0.4, 0.8, n)
        data[f"ATC1_Out{j}"] = rng.uniform(0.4, 0.8, n)
        data[f"ATC2_Out{j}"] = rng.uniform(-0.5, 0.5, n)
    data["BATT_VFilt"] = 15.0 + 0.1 * np.sin(t * 0.002)
    struct = {k: data[k].reshape(-1, 1) for k in _LOG_KEYS}
    scipy.io.savemat(path, {"dataset": struct})


@pytest.fixture
def voliro_dir(tmp_path):
    d = str(tmp_path) + "/"
    # crops: tilt log sliced [1500, 3800], flip log [17600, 20172]
    make_log(d + "voliro_tilt.mat", n=4000, seed=1)
    make_log(d + "voliro_flip.mat", n=20500, seed=2)
    return d


def test_voliro_log_loader(voliro_dir):
    log = VoliroLog(voliro_dir + "voliro_tilt.mat", 1500, 3800)
    n = 2300
    assert log.pos.shape == (n, 3)
    np.testing.assert_allclose(log.pos[0], 0.0, atol=1e-12)  # zeroed at start
    assert log.wxyz.shape == (n, 4)
    np.testing.assert_allclose(np.linalg.norm(log.wxyz, axis=1), 1.0, rtol=1e-10)
    np.testing.assert_allclose(log.rpy[0, 2], 0.0, atol=1e-12)  # yaw zeroed
    np.testing.assert_allclose(log.dt, 0.01, rtol=1e-6)
    assert log.linvel.shape == (n, 3)
    np.testing.assert_allclose(log.linvel[0], 0.0)
    # velocity of sin(0.01 t) with dt 0.01 -> ~0.01*cos(...)/0.01 = cos
    assert np.abs(log.linvel[100:, 0]).max() < 2.0
    assert np.isfinite(log.linacc).all()
    assert np.isfinite(log.angvel).all()
    assert np.isfinite(log.angacc).all()
    assert log.battery.shape == (n,)


def test_voliro_flip_dataset(voliro_dir):
    ds = VoliroFlipDS(seq_len=64, seq_stride=50, data_dir=voliro_dir)
    # flip log crop 17600..20172 -> 2572 samples, split in half
    assert ds.train_in.shape == (1, 1286, 13)
    assert ds.test_in.shape == (1, 1286, 13)
    assert ds.train_out.shape == (1, 1286, 22)
    # transfer set is the tilt log
    assert ds.test_in2.shape == (1, 2300, 13)
    # identity normalization
    np.testing.assert_allclose(ds.std["out"], 1.0)
    np.testing.assert_allclose(ds.mean["in"], 0.0)
    # quaternion channels of y are unit quaternions
    qn = np.linalg.norm(ds.train_out[0, :, 12:16], axis=1)
    np.testing.assert_allclose(qn, 1.0, rtol=1e-8)
    # windows: last window dropped (zero-padding guard)
    n_windows_full = (1286 - 64) // 50 + 1 + ((1286 - 64) % 50 > 0)
    assert ds.train_in_batch.shape == (n_windows_full - 1, 64, 13)
    # u time channel is seconds
    dt = np.diff(ds.train_in[0, :, 12])
    np.testing.assert_allclose(dt, 0.01, rtol=1e-6)


def test_voliro_tilt_dataset(voliro_dir):
    ds = VoliroTiltDS(seq_len=32, seq_stride=30, data_dir=voliro_dir)
    assert ds.train_in.shape == (1, 1150, 13)
    assert ds.test_in2.shape == (1, 2572, 13)


def test_voliro_training_smoke(voliro_dir):
    """End-to-end: Voliro model trains one epoch on real loader output."""
    import jax

    from cbfssm_tpu.models import Voliro
    from cbfssm_tpu.training import Trainer
    from tests.test_other_models import voliro_config

    ds = VoliroFlipDS(seq_len=16, seq_stride=200, data_dir=voliro_dir)
    cfg = voliro_config()
    cfg["ds"] = VoliroFlipDS
    cfg["batch_size"] = 4
    cfg["samples"] = 2
    cfg["dtype"] = "float32"
    cfg["jitter"] = None
    model = Voliro(cfg)
    import tempfile

    trainer = Trainer(model, tempfile.mkdtemp())
    trainer.train(ds, epochs=1)
    assert np.isfinite(trainer.train_all[0])
