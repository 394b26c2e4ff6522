"""Dataset layer tests with synthetic fixtures (no downloaded data)."""

import numpy as np
import pytest
import scipy.io

from cbfssm_tpu.data import DSManager
from cbfssm_tpu.data.base import BaseDS
from cbfssm_tpu.data.datasets import (
    Actuator,
    Ballbeam,
    Drive,
    Dryer,
    Furnace,
    RoboMove,
    RoboMoveSimple,
    Sarcos,
    SpringNonlinear,
)
from cbfssm_tpu.data.generators import (
    RoboMoveDS,
    RoboMovePolicy,
    RoboMoveSimpleDS,
    SpringNonlinearDS,
    spring_nonlinear_system,
)


# --- windowing ------------------------------------------------------------


def test_rnn_batches_basic():
    x = np.arange(10)[None, :, None].astype(float)  # 1 experiment, T=10, dim=1
    out = BaseDS.rnn_batches(x, length=4, stride=2)
    # starts at 0, 2, 4, 6 — (10-4)%2 == 0, no tail window
    assert out.shape == (4, 4, 1)
    np.testing.assert_allclose(out[0, :, 0], [0, 1, 2, 3])
    np.testing.assert_allclose(out[-1, :, 0], [6, 7, 8, 9])


def test_rnn_batches_tail_window_rule():
    x = np.arange(11)[None, :, None].astype(float)
    out = BaseDS.rnn_batches(x, length=4, stride=2)
    # starts 0,2,4,6 plus the tail window [7..10] since (11-4)%2 == 1
    assert out.shape == (5, 4, 1)
    np.testing.assert_allclose(out[-1, :, 0], [7, 8, 9, 10])


def test_rnn_batches_multi_experiment():
    x = np.stack([np.arange(8), np.arange(100, 108)])[:, :, None].astype(float)
    out = BaseDS.rnn_batches(x, length=8, stride=1)
    assert out.shape == (2, 8, 1)
    np.testing.assert_allclose(out[1, :, 0], np.arange(100, 108))


def test_rnn_batches_rejects_short_sequences():
    with pytest.raises(AssertionError):
        BaseDS.rnn_batches(np.zeros((1, 3, 1)), length=4, stride=1)


# --- normalization --------------------------------------------------------


def test_normalize_roundtrip(rng):
    ds = BaseDS(4, 1)
    data_in = rng.normal(3.0, 2.0, size=(100, 2))
    data_out = rng.normal(-1.0, 0.5, size=(100, 1))
    ds.normalize_init(data_in, data_out)
    normed = ds.normalize(data_in, "in")
    np.testing.assert_allclose(normed.mean(axis=0), 0.0, atol=1e-12)
    np.testing.assert_allclose(normed.std(axis=0), 1.0, rtol=1e-12)
    np.testing.assert_allclose(ds.denormalize(normed, "in"), data_in, rtol=1e-10)
    np.testing.assert_allclose(
        ds.denormalize(normed, "in", shift=False), data_in - data_in.mean(axis=0), atol=1e-10
    )


# --- DSManager ------------------------------------------------------------


def test_ds_manager_roundtrip(tmp_path, rng):
    u = rng.normal(size=(50, 2))
    x = rng.normal(size=(50, 3))
    y = rng.normal(size=(50, 1))
    path = str(tmp_path / "test.mat")
    DSManager.save_ds(path, u, x, y, "TestDS")
    u2, x2, y2 = DSManager.load_ds(path, print_title=False)
    np.testing.assert_allclose(u2, u)
    np.testing.assert_allclose(x2, x)
    np.testing.assert_allclose(y2, y)


def test_sample_ds_matrix_column_vector_contract(rng):
    """The matrix-argument sampler (reference ds_manager.py:37-58):
    states/measurements/controls are [d, 1] column vectors; the column
    objects flow to the policy and propagate untouched."""

    class ColumnSim:
        def __init__(self):
            self.x = np.zeros((3, 1))

        def get_state(self):
            return self.x.copy()

        def measure(self):
            return 2.0 * self.x[:2]  # [2, 1]

        def propagate(self, u):
            assert u.shape == (1, 1)  # the column arrives untouched
            self.x = self.x + np.vstack([u, u, u])

    def policy(i, x):
        assert x.shape == (3, 1)  # policy sees the column too
        return np.asarray([[float(i)]])

    u, x, y = DSManager.sample_ds_matrix(ColumnSim(), 4, policy)
    assert u.shape == (4, 1) and x.shape == (4, 3) and y.shape == (4, 2)
    np.testing.assert_allclose(u[:, 0], [0, 1, 2, 3])
    np.testing.assert_allclose(x[:, 0], [0, 0, 1, 3])  # cumsum of u
    np.testing.assert_allclose(y, 2.0 * x[:, :2])


def test_task_consistency_validation():
    """Malformed raw data fails in the loader with a clear message
    (reference tasks.py:113-128 / data_management.py:54-68 checks)."""
    from cbfssm_tpu.data.system_id_tasks import TaskData, validate_task

    ok = TaskData(
        train_in=[np.zeros((10, 2))],
        train_out=[np.zeros((10, 1))],
        test_in=[np.zeros((5, 2))],
        test_out=[np.zeros((5, 1))],
    )
    validate_task(ok)

    bad_len = TaskData(
        train_in=[np.zeros((10, 2))],
        train_out=[np.zeros((9, 1))],
        test_in=[np.zeros((5, 2))],
        test_out=[np.zeros((5, 1))],
    )
    with pytest.raises(ValueError, match="length"):
        validate_task(bad_len)

    bad_chan = TaskData(
        train_in=[np.zeros((10, 2))],
        train_out=[np.zeros((10, 1))],
        test_in=[np.zeros((5, 3))],
        test_out=[np.zeros((5, 1))],
    )
    with pytest.raises(ValueError, match="channel"):
        validate_task(bad_chan)

    # a raw file shorter than its published split point -> zero-length
    # test experiment; must fail HERE, not deep inside windowing
    truncated = TaskData(
        train_in=[np.zeros((10, 2))],
        train_out=[np.zeros((10, 1))],
        test_in=[np.zeros((0, 2))],
        test_out=[np.zeros((0, 1))],
    )
    with pytest.raises(ValueError, match="truncated"):
        validate_task(truncated)

    nan = np.zeros((10, 1))
    nan[3] = np.nan
    bad_nan = TaskData(
        train_in=[np.zeros((10, 2))],
        train_out=[nan],
        test_in=[np.zeros((5, 2))],
        test_out=[np.zeros((5, 1))],
    )
    with pytest.raises(ValueError, match="non-finite"):
        validate_task(bad_nan)

    empty = TaskData(train_in=[], train_out=[], test_in=[], test_out=[])
    with pytest.raises(ValueError, match="empty"):
        validate_task(empty)


# --- system-id dataset classes (synthetic fixtures) -----------------------


@pytest.fixture
def sysid_dir(tmp_path, rng):
    d = str(tmp_path) + "/"
    scipy.io.savemat(
        d + "actuator.mat",
        {"u": rng.normal(size=(1024, 1)), "p": rng.normal(size=(1024, 1))},
    )
    np.savetxt(d + "ballbeam.dat", rng.normal(size=(1000, 2)))
    scipy.io.savemat(
        d + "drive.mat",
        {"u1": rng.normal(size=(500, 1)), "z1": rng.normal(size=(500, 1))},
    )
    np.savetxt(
        d + "gas_furnace.csv",
        rng.normal(size=(296, 2)),
        delimiter=",",
        header="u,y",
        comments="",
    )
    np.savetxt(d + "dryer.dat", rng.normal(size=(1000, 2)))
    scipy.io.savemat(
        d + "sarcos_inv.mat", {"sarcos_inv": rng.normal(size=(674 * 66, 28))}
    )
    return d


@pytest.mark.parametrize(
    "cls,split,total",
    [
        (Actuator, 512, 1024),
        (Ballbeam, 500, 1000),
        (Drive, 250, 500),
        (Furnace, 148, 296),
        (Dryer, 500, 1000),
    ],
)
def test_smallscale_datasets(sysid_dir, cls, split, total):
    ds = cls(seq_len=20, seq_stride=5, data_dir=sysid_dir)
    assert ds.train_in.shape == (1, split, 1)
    assert ds.test_in.shape == (1, total - split, 1)
    # train split is exactly z-scored
    np.testing.assert_allclose(ds.train_in.reshape(-1, 1).mean(), 0.0, atol=1e-10)
    np.testing.assert_allclose(ds.train_in.reshape(-1, 1).std(), 1.0, rtol=1e-10)
    # windows have the right shape
    assert ds.train_in_batch.shape[1:] == (20, 1)
    assert ds.train_out_batch.shape == ds.train_in_batch.shape


def test_sarcos_dataset(sysid_dir):
    ds = Sarcos(seq_len=50, seq_stride=10, data_dir=sysid_dir)
    # 66 experiments of 674 samples downsampled by 2 -> 337 steps
    assert ds.train_in.shape == (60, 337, 7)
    assert ds.test_in.shape == (6, 337, 7)
    assert ds.train_out.shape == (60, 337, 7)
    # windows: (337-50)//10+1 = 29 full + 1 tail per experiment
    assert ds.train_in_batch.shape[0] == 60 * 30


# --- DSManager-based dataset classes --------------------------------------


@pytest.fixture
def dsmanager_dir(tmp_path, rng):
    d = str(tmp_path) + "/"
    for name, du, dy, n in [
        ("robomove_simple.mat", 2, 4, 30000),
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


def test_robomove_datasets(dsmanager_dir):
    ds = RoboMove(seq_len=100, seq_stride=50, data_dir=dsmanager_dir)
    assert ds.train_in.shape == (1, 25000, 2)
    assert ds.test_in.shape == (1, 5000, 2)
    ds2 = RoboMoveSimple(seq_len=100, seq_stride=50, data_dir=dsmanager_dir)
    assert ds2.train_out.shape == (1, 25000, 4)


def test_spring_nonlinear_y_crop(dsmanager_dir):
    ds = SpringNonlinear(seq_len=50, seq_stride=10, data_dir=dsmanager_dir)
    # y is cropped to the first output dim
    assert ds.train_out.shape == (1, 5000, 1)
    assert ds.test_out.shape == (1, 5000, 1)


def test_resample_cubic(rng):
    from cbfssm_tpu.data.system_id_tasks import TaskData, resample, resample_task

    t = np.linspace(0, 4 * np.pi, 100)
    data = np.stack((np.sin(t), np.cos(t)), axis=1)
    up = resample(data, 2.0)
    assert up.shape == (200, 2)
    t_up = np.linspace(0, 4 * np.pi, 200)
    np.testing.assert_allclose(up[:, 0], np.sin(t_up), atol=1e-3)
    down = resample(data, 0.5)
    assert down.shape == (50, 2)

    task = TaskData(train_in=[data], train_out=[data], test_in=[data], test_out=[data], dt=0.1)
    task2 = resample_task(task, 2.0)
    assert task2.train_in[0].shape == (200, 2)
    np.testing.assert_allclose(task2.dt, 0.05)


# --- generators -----------------------------------------------------------


def test_robomove_simulator_rollout(rng):
    sim = RoboMoveSimpleDS(np.zeros(2), 0.0, 1e-5, 1e-4, rng=rng)
    policy = RoboMovePolicy(rng=rng)
    u, x, y = DSManager.sample_ds(sim, 300, policy)
    assert u.shape == (300, 2)
    assert x.shape == (300, 4)
    assert y.shape == (300, 4)
    # orientation encoding stays ~unit norm
    norms = np.linalg.norm(x[:, 2:], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)


def test_robomove_partial_observation(rng):
    sim = RoboMoveDS(np.zeros(2), 0.0, 1e-5, 1e-4, rng=rng)
    u, x, y = DSManager.sample_ds(sim, 100, lambda ts, s: np.asarray([0.3, 0.0]))
    assert x.shape == (100, 3)
    assert y.shape == (100, 2)  # position only
    # straight-line motion: orientation constant
    np.testing.assert_allclose(x[:, 2], 0.0, atol=1e-10)


def test_spring_nonlinear_simulator(rng):
    a, b, c = spring_nonlinear_system()
    sim = SpringNonlinearDS(a, b, c, np.zeros((3, 3)), np.eye(1) * 1e-12, np.array([1.0, 0, 0]), rng=rng)
    u, x, y = DSManager.sample_ds(sim, 50, lambda ts, s: np.asarray([0.5]))
    assert x.shape == (50, 3)
    assert y.shape == (50, 1)
    # observation is the first state dim (+tiny noise)
    np.testing.assert_allclose(y[:, 0], x[:, 0], atol=1e-4)
    # tanh nonlinearity: input saturates, dynamics stay bounded over 50 steps
    assert np.abs(x).max() < 1e3


def test_data_dir_without_trailing_separator(dsmanager_dir):
    """data_dir without a trailing slash must work for the
    path-concatenating dataset families (regression: string concat
    produced '/tmp/xrobomove.mat' while --check-data passed)."""
    ds = RoboMove(seq_len=100, seq_stride=50,
                  data_dir=dsmanager_dir.rstrip("/"))
    assert ds.train_in_batch.shape[0] > 0
