"""Streaming/online filtering (CBFSSMHALF.filter_* + serving.StreamingFilter).

The per-step online update must be the EXACT training-rollout transition
(shared `_transition` body): feeding the rollout's own noise draws into
`filter_step` must reproduce the rollout trajectory to float64 solver
noise (the rollout runs under lax.scan whose fusion differs in the last
ulp from the per-call program).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.models import CBFSSMHALF
from cbfssm_tpu.serving import StreamingFilter
from tests.test_other_models import half_config


@pytest.fixture
def setup(rng):
    model = CBFSSMHALF(half_config("rnn"))
    params = model.init(jax.random.PRNGKey(0))
    u = rng.normal(size=(2, 8, 2))
    y = rng.normal(size=(2, 8, 1))
    return model, params, u, y


def test_filter_step_reproduces_rollout(setup):
    model, params, u, y = setup
    key = jax.random.PRNGKey(3)
    x_final, _, _ = model._rollout(params, u, y, key, condition=True)

    t_len, b, s = 8, 2, model.samples
    eps = model._shared_eps(key, (t_len - 1, b, s), model.dtype)
    ops = model.filter_ops(params)
    u_tm = jnp.transpose(jnp.asarray(u, model.dtype), (1, 0, 2))
    y_tm = jnp.transpose(jnp.asarray(y, model.dtype), (1, 0, 2))

    x = model.filter_init(params, u, y)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x_final[0]))
    for t in range(t_len - 1):
        x, (mean, var) = model.filter_step(
            params, ops, x, u_tm[t], y_tm[t + 1], key=None, eps=eps[t]
        )
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(x_final[t + 1]), rtol=1e-12, atol=1e-13
        )
        x = x_final[t + 1]  # resync so ulp drift cannot compound
        assert mean.shape == (b, model.dim_y)
        assert float(jnp.min(var)) > 0


def test_forecast_is_free_running_and_pure(setup):
    model, params, u, y = setup
    ops = model.filter_ops(params)
    x = model.filter_init(params, u, y)
    key = jax.random.PRNGKey(5)
    u_future = jnp.asarray(np.ones((2, 6, 2)), model.dtype)
    mean, var = model.forecast(params, ops, x, u_future, key)
    assert mean.shape == (2, 6, 1) and var.shape == (2, 6, 1)
    assert np.isfinite(np.asarray(mean)).all()
    assert float(jnp.min(var)) > 0
    # purity: same inputs -> same outputs, caller's ensemble untouched
    mean2, _ = model.forecast(params, ops, x, u_future, key)
    np.testing.assert_array_equal(np.asarray(mean), np.asarray(mean2))


def test_streaming_filter_end_to_end(setup):
    model, params, u, y = setup
    f = StreamingFilter(model, params, batch=2)
    with pytest.raises(RuntimeError, match="start"):
        f.update(u[:, 0], y[:, 0])
    f.start(u[:, :4], y[:, :4])
    means = []
    for t in range(4, 8):
        mean, var = f.update(u[:, t - 1], y[:, t])
        assert mean.shape == (2, 1) and var.shape == (2, 1)
        assert np.isfinite(np.asarray(mean)).all()
        means.append(np.asarray(mean))
    # distinct steps draw distinct noise / see distinct data
    assert not np.array_equal(means[0], means[1])

    fmean, fvar = f.forecast(np.zeros((2, 5, 2)))
    assert fmean.shape == (2, 5, 1) and np.isfinite(np.asarray(fmean)).all()
    # forecast must not advance the filter state
    x_before, t_before, _key = f.state
    f.forecast(np.zeros((2, 5, 2)))
    x_after, t_after, _key = f.state
    np.testing.assert_array_equal(x_before, x_after)
    assert t_before == t_after


def test_streaming_filter_state_roundtrip(setup):
    """Failover: a new filter restored from `state` continues the exact
    same trajectory as the original."""
    model, params, u, y = setup
    f1 = StreamingFilter(model, params, batch=2)
    f1.start(u[:, :4], y[:, :4])
    f1.update(u[:, 3], y[:, 4])
    saved = f1.state

    # the standby was built with a DIFFERENT seed: the snapshot carries
    # the base key, so the resumed draw stream is still the primary's
    # (this case silently diverged before the key rode along)
    f2 = StreamingFilter(model, params, batch=2, seed=99)
    f2.load_state(saved)
    m1, v1 = f1.update(u[:, 4], y[:, 5])
    m2, v2 = f2.update(u[:, 4], y[:, 5])
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    # legacy 2-tuple snapshots (pre-key) still load, keeping own key
    f3 = StreamingFilter(model, params, batch=2)
    f3.load_state((saved[0], saved[1]))
    m3, _ = f3.update(u[:, 4], y[:, 5])
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m3))
    # a malformed key is refused, not silently folded
    with pytest.raises(ValueError, match="snapshot key"):
        f3.load_state((saved[0], saved[1], np.zeros((7,), np.float32)))


def test_streaming_rejects_models_without_interface(setup):
    _, _, u, y = setup
    from tests.test_cbfssm_model import make_model

    full = make_model()
    with pytest.raises(TypeError, match="StreamingFilter supports"):
        StreamingFilter(full, full.init(jax.random.PRNGKey(0)))


def test_prefix_shape_guard(setup):
    model, params, u, y = setup
    f = StreamingFilter(model, params, batch=2)
    with pytest.raises(ValueError, match="prefix shape"):
        f.start(u[:, :3], y[:, :3])  # recog_len is 4


def test_load_state_validates_ensemble_shape(setup):
    model, params, u, y = setup
    f = StreamingFilter(model, params, batch=2)
    r = int(model.config.recog_len)
    f.start(u[:, :r], y[:, :r])
    saved = f.state
    with pytest.raises(ValueError, match="ensemble must be"):
        f.load_state((saved[0][:1], saved[1]))  # wrong batch
    f.load_state(saved)  # the real state still loads


def _sequential_updates(f, u, y, t_from, t_to):
    """Drive `f` with single-step updates over [t_from, t_to); returns
    stacked (mean [B, K, dy], var [B, K, dy])."""
    ms, vs = [], []
    for t in range(t_from, t_to):
        m, v = f.update(u[:, t - 1], y[:, t])
        ms.append(np.asarray(m))
        vs.append(np.asarray(v))
    return np.stack(ms, axis=1), np.stack(vs, axis=1)


@pytest.fixture
def replay_setup(rng):
    model = CBFSSMHALF(half_config("rnn"))
    params = model.init(jax.random.PRNGKey(0))
    u = rng.normal(size=(2, 20, 2))
    y = rng.normal(size=(2, 20, 1))
    r = int(model.config.recog_len)
    ref = StreamingFilter(model, params, batch=2)
    ref.start(u[:, :r], y[:, :r])
    seq_m, seq_v = _sequential_updates(ref, u, y, r, r + 8)
    return model, params, u, y, r, ref, seq_m, seq_v


def test_replay_matches_sequential_updates(replay_setup):
    """One fused replay dispatch reproduces K sequential updates —
    outputs, final ensemble, and step counter — to the documented f64
    last-ulp scan-vs-per-call fusion noise."""
    model, params, u, y, r, ref, seq_m, seq_v = replay_setup
    f = StreamingFilter(model, params, batch=2)
    f.start(u[:, :r], y[:, :r])
    m, v = f.replay(u[:, r - 1:r + 7], y[:, r:r + 8])
    np.testing.assert_allclose(np.asarray(m), seq_m, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(v), seq_v, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(f.state[0]), np.asarray(ref.state[0]),
        rtol=1e-12, atol=1e-14,
    )
    assert f.state[1] == ref.state[1] == 8


def test_replay_bucketed_chunks_and_padding(replay_setup):
    """A bucket ladder smaller than the backlog chunks it (full
    max-bucket chunks + one padded remainder); padded steps hold the
    ensemble and are sliced out of the outputs. The stream continues
    from the same counter afterwards."""
    model, params, u, y, r, ref, seq_m, seq_v = replay_setup
    # K=8 over ladder (2, 3): chunks 3+3+2 (exact), no padding
    f = StreamingFilter(model, params, batch=2, replay_buckets=(2, 3))
    f.start(u[:, :r], y[:, :r])
    m, v = f.replay(u[:, r - 1:r + 7], y[:, r:r + 8])
    np.testing.assert_allclose(np.asarray(m), seq_m, rtol=1e-12, atol=1e-14)
    # K=8 over ladder (16,): one padded program
    g = StreamingFilter(model, params, batch=2, replay_buckets=(16,))
    g.start(u[:, :r], y[:, :r])
    gm, gv = g.replay(u[:, r - 1:r + 7], y[:, r:r + 8])
    assert gm.shape == (2, 8, 1)
    np.testing.assert_allclose(np.asarray(gm), seq_m, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(
        np.asarray(g.state[0]), np.asarray(ref.state[0]),
        rtol=1e-12, atol=1e-14,
    )
    assert g.state[1] == 8  # padding must not advance the counter
    # continuation: the next update matches the sequential stream
    m_ref, _ = ref.update(u[:, r + 7], y[:, r + 8])
    m_g, _ = g.update(u[:, r + 7], y[:, r + 8])
    np.testing.assert_allclose(
        np.asarray(m_g), np.asarray(m_ref), rtol=1e-11, atol=1e-13
    )


def test_replay_failover_catchup(replay_setup):
    """The failover story: a replica restores a snapshot, replays the
    backlog accumulated since, and lands on the primary's state."""
    model, params, u, y, r, ref, seq_m, _ = replay_setup
    primary = StreamingFilter(model, params, batch=2)
    primary.start(u[:, :r], y[:, :r])
    primary.update(u[:, r - 1], y[:, r])
    snapshot = primary.state
    _sequential_updates(primary, u, y, r + 1, r + 6)  # backlog forms

    replica = StreamingFilter(model, params, batch=2, replay_buckets=(4,))
    replica.load_state(snapshot)
    replica.replay(u[:, r:r + 5], y[:, r + 1:r + 6])
    np.testing.assert_allclose(
        np.asarray(replica.state[0]), np.asarray(primary.state[0]),
        rtol=1e-12, atol=1e-14,
    )
    assert replica.state[1] == primary.state[1]


def test_replay_guards(replay_setup):
    model, params, u, y, r, *_ = replay_setup
    with pytest.raises(ValueError, match="replay_buckets"):
        StreamingFilter(model, params, batch=2, replay_buckets=())
    with pytest.raises(ValueError, match="replay_buckets"):
        StreamingFilter(model, params, batch=2, replay_buckets=(0,))
    f = StreamingFilter(model, params, batch=2)
    with pytest.raises(RuntimeError, match="start"):
        f.replay(u[:, :2], y[:, :2])
    f.start(u[:, :r], y[:, :r])
    with pytest.raises(ValueError, match="u_block"):
        f.replay(u[0, :2], y[:, :2])  # batch dim forgotten
    with pytest.raises(ValueError, match="y_block"):
        f.replay(u[:, :3], y[:, :2])  # length mismatch
    with pytest.raises(ValueError, match="at least one step"):
        f.replay(u[:, :0], y[:, :0])


class _FourMethodModel:
    """The pre-replay streaming contract: everything but
    filter_replay delegates to a real model."""

    def __init__(self, model):
        object.__setattr__(self, "_m", model)

    def __getattr__(self, name):
        if name == "filter_replay":
            raise AttributeError(name)
        return getattr(self._m, name)


def test_four_method_models_still_serve_without_replay(replay_setup):
    """A model satisfying the original four-method streaming contract
    constructs and serves; only replay use demands filter_replay."""
    model, params, u, y, r, *_ = replay_setup
    f = StreamingFilter(_FourMethodModel(model), params, batch=2)
    f.start(u[:, :r], y[:, :r])
    mean, _ = f.update(u[:, r - 1], y[:, r])
    assert np.isfinite(np.asarray(mean)).all()
    with pytest.raises(TypeError, match="filter_replay"):
        f.replay(u[:, r:r + 2], y[:, r + 1:r + 3])
    with pytest.raises(TypeError, match="filter_replay"):
        StreamingFilter(_FourMethodModel(model), params, batch=2,
                        replay_buckets=(4,))


def test_plan_replay_chunks():
    from cbfssm_tpu.serving import plan_replay_chunks

    assert plan_replay_chunks(5, ()) == [(5, 5)]
    assert plan_replay_chunks(8, (2, 3)) == [(3, 3), (3, 3), (2, 2)]
    assert plan_replay_chunks(8, (16,)) == [(8, 16)]
    assert plan_replay_chunks(7, (2, 4)) == [(4, 4), (3, 4)]
    assert plan_replay_chunks(4, (4,)) == [(4, 4)]
    with pytest.raises(ValueError, match="at least one step"):
        plan_replay_chunks(0, (4,))
    with pytest.raises(ValueError, match=">= 1"):
        plan_replay_chunks(3, (0, 4))


def test_forecast_shape_guard(setup):
    """A u_future missing its batch dim must raise the clear error, not
    poison the per-horizon executable cache with a bogus shape."""
    model, params, u, y = setup
    f = StreamingFilter(model, params, batch=2)
    r = int(model.config.recog_len)
    f.start(u[:, :r], y[:, :r])
    with pytest.raises(ValueError, match="u_future must be"):
        f.forecast(u[0, :4])  # [H, du], batch dim forgotten
    mean, var = f.forecast(u[:, :4])  # correct shape still works
    assert mean.shape[0] == 2
