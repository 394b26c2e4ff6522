"""FilterPool: many online-filtering sessions, one compiled step.

Contracts pinned here: lockstep equivalence with a batched
StreamingFilter (same keys, same math), slot isolation (co-resident
session content never leaks), hold semantics for omitted sessions,
slot lifecycle, and failover state round-trip.
"""

import jax
import numpy as np
import pytest

from cbfssm_tpu.models import CBFSSMHALF
from cbfssm_tpu.parallel.sharding import make_mesh
from cbfssm_tpu.serving import FilterPool, StreamingFilter
from tests.test_other_models import half_config

RECOG = 4  # half_config recog_len
DU, DY = 2, 1


@pytest.fixture(scope="module")
def mp():
    model = CBFSSMHALF(half_config("rnn"))
    return model, model.init(jax.random.PRNGKey(0))


def prefix(rng):
    return rng.normal(size=(RECOG, DU)), rng.normal(size=(RECOG, DY))


def test_pool_matches_batched_streaming_filter(mp, rng):
    """Two pooled sessions driven in lockstep equal one batch-2
    StreamingFilter fed the stacked streams (same seed => same fold
    keys; the pool's hold-mask is exact when all sessions step)."""
    model, params = mp
    pa, pb = prefix(rng), prefix(rng)
    pool = FilterPool(model, params, capacity=2, seed=0)
    a = pool.attach(*pa)
    b = pool.attach(*pb)

    sf = StreamingFilter(model, params, batch=2, seed=0)
    sf.start(
        np.stack([pa[0], pb[0]]), np.stack([pa[1], pb[1]])
    )
    np.testing.assert_allclose(
        pool.state[0], np.asarray(sf._x), rtol=1e-12, atol=1e-14
    )

    for _ in range(3):
        u = rng.normal(size=(2, DU))
        y = rng.normal(size=(2, DY))
        out = pool.step({a: (u[0], y[0]), b: (u[1], y[1])})
        mean_sf, var_sf = sf.update(u, y)
        np.testing.assert_allclose(
            out[a][0], np.asarray(mean_sf)[0], rtol=1e-12, atol=1e-14
        )
        np.testing.assert_allclose(
            out[b][1], np.asarray(var_sf)[1], rtol=1e-12, atol=1e-14
        )
        np.testing.assert_allclose(
            pool.state[0], np.asarray(sf._x), rtol=1e-12, atol=1e-14
        )

    u_future = rng.normal(size=(5, DU))
    fc = pool.forecast({a: u_future, b: u_future})
    mean_sf, var_sf = sf.forecast(np.stack([u_future, u_future]))
    np.testing.assert_allclose(
        fc[a][0], np.asarray(mean_sf)[0], rtol=1e-12, atol=1e-14
    )
    np.testing.assert_allclose(
        fc[b][1], np.asarray(var_sf)[1], rtol=1e-12, atol=1e-14
    )


def test_slot_isolation(mp, rng):
    """Session A's trajectory is bitwise independent of what shares
    the pool: same slot, same inputs, different neighbor content."""
    model, params = mp
    pa = prefix(rng)
    other1, other2 = prefix(rng), prefix(rng)
    steps = [(rng.normal(size=DU), rng.normal(size=DY)) for _ in range(2)]
    neighbor_steps = [(rng.normal(size=DU), rng.normal(size=DY)) for _ in range(2)]

    def run(neighbor_prefix, neighbor_steps):
        pool = FilterPool(model, params, capacity=2, seed=0)
        a = pool.attach(*pa)
        n = pool.attach(*neighbor_prefix)
        outs = []
        for (u, y), (nu, ny) in zip(steps, neighbor_steps):
            outs.append(pool.step({a: (u, y), n: (nu, ny)})[a])
        return outs, pool.state[0][0]

    outs1, row1 = run(other1, neighbor_steps)
    outs2, row2 = run(other2, list(reversed(neighbor_steps)))
    for (m1, v1), (m2, v2) in zip(outs1, outs2):
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(row1, row2)


def test_hold_semantics(mp, rng):
    """A session omitted from step() keeps its state exactly; the
    stepped session advances."""
    model, params = mp
    pool = FilterPool(model, params, capacity=2, seed=0)
    a = pool.attach(*prefix(rng))
    b = pool.attach(*prefix(rng))
    x_before = pool.state[0]
    out = pool.step({a: (rng.normal(size=DU), rng.normal(size=DY))})
    assert set(out) == {a}
    x_after = pool.state[0]
    slot_a, slot_b = 0, 1  # attach order fills slot 0 first
    np.testing.assert_array_equal(x_after[slot_b], x_before[slot_b])
    assert np.abs(x_after[slot_a] - x_before[slot_a]).max() > 0


def test_slot_lifecycle(mp, rng):
    model, params = mp
    pool = FilterPool(model, params, capacity=2, seed=0)
    a = pool.attach(*prefix(rng))
    b = pool.attach(*prefix(rng))
    assert pool.active == 2
    with pytest.raises(RuntimeError, match="pool full"):
        pool.attach(*prefix(rng))
    pool.detach(a)
    assert pool.active == 1
    # the freed slot is zeroed and reusable
    np.testing.assert_array_equal(pool.state[0][0], 0.0)
    c = pool.attach(*prefix(rng))
    assert c not in (a, b)  # sids are never reused
    assert pool.active == 2
    with pytest.raises(KeyError):
        pool.detach(a)
    with pytest.raises(KeyError):
        pool.step({a: (np.zeros(DU), np.zeros(DY))})


def test_validation(mp, rng):
    model, params = mp
    pool = FilterPool(model, params, capacity=1, seed=0)
    with pytest.raises(ValueError, match="u_prefix"):
        pool.attach(np.zeros((RECOG + 1, DU)), np.zeros((RECOG, DY)))
    with pytest.raises(ValueError, match="match u_prefix"):
        pool.attach(np.zeros((RECOG, DU)), np.zeros((RECOG, DY + 1)))
    a = pool.attach(*prefix(rng))
    with pytest.raises(ValueError, match="expected u"):
        pool.step({a: (np.zeros(DU + 1), np.zeros(DY))})
    with pytest.raises(ValueError, match="at least one"):
        pool.step({})
    with pytest.raises(ValueError, match="at least one"):
        pool.forecast({})
    with pytest.raises(ValueError, match="u_future"):
        pool.forecast({a: np.zeros((3, DU + 1))})
    with pytest.raises(TypeError, match="streaming interface"):
        from tests.test_cbfssm_model import make_model

        FilterPool(make_model(), params, capacity=1)


def test_forecast_shared_horizon(mp, rng):
    model, params = mp
    pool = FilterPool(model, params, capacity=2, seed=0)
    a = pool.attach(*prefix(rng))
    b = pool.attach(*prefix(rng))
    with pytest.raises(ValueError, match="one horizon"):
        pool.forecast({a: np.zeros((3, DU)), b: np.zeros((4, DU))})
    fc = pool.forecast({a: np.ones((3, DU))})
    assert fc[a][0].shape == (3, DY) and (fc[a][1] > 0).all()
    # forecast is pure: pool state unchanged, tick unchanged
    fc2 = pool.forecast({a: np.ones((3, DU))})
    np.testing.assert_array_equal(fc[a][0], fc2[a][0])


def test_state_roundtrip(mp, rng):
    """Failover: serialize mid-stream, restore into a fresh pool,
    continue — identical to the uninterrupted run."""
    model, params = mp
    pa, pb = prefix(rng), prefix(rng)
    stream = [
        ((rng.normal(size=DU), rng.normal(size=DY)),
         (rng.normal(size=DU), rng.normal(size=DY)))
        for _ in range(4)
    ]

    pool = FilterPool(model, params, capacity=2, seed=0)
    a = pool.attach(*pa)
    b = pool.attach(*pb)
    for (ua, ya), (ub, yb) in stream[:2]:
        pool.step({a: (ua, ya), b: (ub, yb)})
    snapshot = pool.state

    outs_cont = [
        pool.step({a: s[0], b: s[1]}) for s in stream[2:]
    ]

    pool2 = FilterPool(model, params, capacity=2, seed=0)
    pool2.load_state(snapshot)
    assert pool2.active == 2
    outs_restored = [
        pool2.step({a: s[0], b: s[1]}) for s in stream[2:]
    ]
    for o1, o2 in zip(outs_cont, outs_restored):
        for sid in (a, b):
            np.testing.assert_array_equal(o1[sid][0], o2[sid][0])
            np.testing.assert_array_equal(o1[sid][1], o2[sid][1])

    with pytest.raises(ValueError, match="shape"):
        FilterPool(model, params, capacity=3, seed=0).load_state(snapshot)
    # a corrupt session table fails fast, not by silently cross-wiring
    # two sessions onto one ensemble row (or a later bare IndexError)
    x, tick, slots, next_sid, _key = snapshot
    dup = dict(slots)
    dup[a] = dup[b]
    with pytest.raises(ValueError, match="one slot"):
        FilterPool(model, params, capacity=2, seed=0).load_state(
            (x, tick, dup, next_sid))
    oob = dict(slots)
    oob[a] = 99
    with pytest.raises(ValueError, match="out-of-range"):
        FilterPool(model, params, capacity=2, seed=0).load_state(
            (x, tick, oob, next_sid))
    # next_sid colliding with a live sid would make attach() reissue
    # it and silently cross-wire two sessions later
    with pytest.raises(ValueError, match="next_sid"):
        FilterPool(model, params, capacity=2, seed=0).load_state(
            (x, tick, slots, max(slots)))
    # == max+1 is the tightest legal value
    FilterPool(model, params, capacity=2, seed=0).load_state(
        (x, tick, slots, max(slots) + 1))
    # string-typed tables (hand-decoded JSON) must be coerced before
    # storing: raw string slots would miss the used-set and hand a
    # restored session's row to the next attach()
    strly = FilterPool(model, params, capacity=2, seed=0)
    strly.load_state(
        (x, tick, {str(s): str(v) for s, v in slots.items()}, next_sid))
    assert strly._slots == slots
    assert all(isinstance(s, int) and isinstance(v, int)
               for s, v in strly._slots.items())
    assert set(strly._free) == (
        set(range(2)) - set(slots.values()))
    # int()-aliased keys ("0" and "+0") would silently collapse
    with pytest.raises(ValueError, match="duplicate"):
        FilterPool(model, params, capacity=2, seed=0).load_state(
            (x, tick, {"0": 0, "+0": 1}, 5))


def test_pool_forecast_input_rank_guard(mp, rng):
    """Malformed u_future shapes fail with a clear error: a 1-D [du]
    input must not be read as horizon=du, and an empty [0, du] input
    must not AOT-compile a useless H=0 program."""
    model, params = mp
    pool = FilterPool(model, params, capacity=2, seed=0)
    sid = pool.attach(*prefix(rng))
    with pytest.raises(ValueError, match="H >= 1"):
        pool.forecast({sid: rng.normal(size=(DU,))})
    with pytest.raises(ValueError, match="H >= 1"):
        pool.forecast({sid: np.zeros((0, DU))})
    with pytest.raises(ValueError, match="H >= 1"):
        pool.forecast({sid: np.float64(1.0)})


def test_pool_on_mesh_matches_unsharded(mp, rng):
    """Fleet scale-out: a pool whose capacity axis is sharded over a
    4-device mesh is bitwise identical to the unsharded pool across
    attach / lockstep steps / hold / forecast / detach, and its state
    snapshot restores into an unsharded pool (failover across
    topologies)."""
    model, params = mp
    mesh = make_mesh(4)
    pool_m = FilterPool(model, params, capacity=4, seed=0, mesh=mesh)
    pool = FilterPool(model, params, capacity=4, seed=0)

    sids_m, sids = [], []
    for _ in range(3):
        p = prefix(rng)
        sids_m.append(pool_m.attach(*p))
        sids.append(pool.attach(*p))
    np.testing.assert_array_equal(pool_m.state[0], pool.state[0])

    for tick in range(3):
        inputs = {
            s: (rng.normal(size=DU), rng.normal(size=DY)) for s in sids
        }
        if tick == 1:  # hold one session: mask path under sharding
            inputs.pop(sids[1])
        out_m = pool_m.step({sm: inputs[s] for sm, s in zip(sids_m, sids)
                             if s in inputs})
        out = pool.step(inputs)
        for sm, s in zip(sids_m, sids):
            if s in inputs:
                np.testing.assert_array_equal(out_m[sm][0], out[s][0])
                np.testing.assert_array_equal(out_m[sm][1], out[s][1])
        np.testing.assert_array_equal(pool_m.state[0], pool.state[0])

    u_future = rng.normal(size=(4, DU))
    fc_m = pool_m.forecast({sids_m[0]: u_future})
    fc = pool.forecast({sids[0]: u_future})
    np.testing.assert_array_equal(fc_m[sids_m[0]][0], fc[sids[0]][0])
    np.testing.assert_array_equal(fc_m[sids_m[0]][1], fc[sids[0]][1])

    pool_m.detach(sids_m[2])
    pool.detach(sids[2])
    np.testing.assert_array_equal(pool_m.state[0], pool.state[0])

    # failover across topologies: sharded snapshot -> unsharded pool
    pool2 = FilterPool(model, params, capacity=4, seed=0)
    pool2.load_state(pool_m.state)
    step_in = {sids_m[0]: (rng.normal(size=DU), rng.normal(size=DY))}
    o_m = pool_m.step(step_in)
    o_2 = pool2.step(step_in)
    np.testing.assert_array_equal(
        o_m[sids_m[0]][0], o_2[sids_m[0]][0]
    )


def _pool_with_sessions(mp, rng_seed=7, **kw):
    model, params = mp
    rng = np.random.default_rng(rng_seed)
    data = {
        i: (rng.normal(size=(20, DU)), rng.normal(size=(20, DY)))
        for i in range(3)
    }
    pool = FilterPool(model, params, capacity=4, seed=0, **kw)
    sids = {i: pool.attach(u[:RECOG], y[:RECOG]) for i, (u, y) in data.items()}
    return pool, sids, data


def _sequential_pool_catchup(pool, sids, data, backlogs):
    """The reference schedule replay must match: tick t carries exactly
    the sessions with backlog length > t. Returns {i: [(mean, var)..]}."""
    out = {i: [] for i in backlogs}
    for t in range(max(backlogs.values())):
        ins = {}
        for i, k in backlogs.items():
            if t < k:
                u, y = data[i]
                ins[sids[i]] = (u[RECOG - 1 + t], y[RECOG + t])
        res = pool.step(ins)
        for i in backlogs:
            if sids[i] in res:
                out[i].append(res[sids[i]])
    return out


BACKLOGS = {0: 5, 1: 3}  # session 2 holds throughout


def _backlog_inputs(sids, data):
    return {
        sids[i]: (
            data[i][0][RECOG - 1:RECOG - 1 + k],
            data[i][1][RECOG:RECOG + k],
        )
        for i, k in BACKLOGS.items()
    }


def test_pool_replay_matches_sequential_ragged(mp):
    """Ragged per-session backlogs catch up in one fused dispatch,
    matching the sequential tick schedule; unlisted sessions hold."""
    model, params = mp
    p_seq, s_seq, data = _pool_with_sessions(mp)
    seq = _sequential_pool_catchup(p_seq, s_seq, data, BACKLOGS)

    p_rep, s_rep, _ = _pool_with_sessions(mp)
    res = p_rep.replay(_backlog_inputs(s_rep, data))
    for i, k in BACKLOGS.items():
        m, v = res[s_rep[i]]
        assert m.shape == (k, DY) and v.shape == (k, DY)
        np.testing.assert_allclose(
            m, np.stack([mm for mm, _ in seq[i]]), rtol=1e-12, atol=1e-14
        )
        np.testing.assert_allclose(
            v, np.stack([vv for _, vv in seq[i]]), rtol=1e-12, atol=1e-14
        )
    np.testing.assert_allclose(
        p_rep.state[0], p_seq.state[0], rtol=1e-12, atol=1e-14
    )
    assert p_rep._tick == p_seq._tick == max(BACKLOGS.values())
    # the held session's ensemble row is bitwise untouched
    held = s_rep[2]
    slot = p_rep._slots[held]
    p_fresh, s_fresh, _ = _pool_with_sessions(mp)
    np.testing.assert_array_equal(
        p_rep.state[0][slot], p_fresh.state[0][p_fresh._slots[s_fresh[2]]]
    )


def test_pool_replay_bucketed(mp):
    """A bucket ladder chunks + pads the pool replay identically."""
    model, params = mp
    p_seq, s_seq, data = _pool_with_sessions(mp)
    seq = _sequential_pool_catchup(p_seq, s_seq, data, BACKLOGS)
    p_b, s_b, _ = _pool_with_sessions(mp, replay_buckets=(2,))
    res = p_b.replay(_backlog_inputs(s_b, data))
    for i in BACKLOGS:
        np.testing.assert_allclose(
            res[s_b[i]][0], np.stack([mm for mm, _ in seq[i]]),
            rtol=1e-12, atol=1e-14,
        )
    np.testing.assert_allclose(
        p_b.state[0], p_seq.state[0], rtol=1e-12, atol=1e-14
    )
    assert p_b._tick == p_seq._tick


def test_pool_replay_on_mesh_matches_unsharded(mp):
    """Replay on a 4-device mesh equals the unsharded pool (scan
    partitioning may differ in the last f64 ulp, like every other
    mesh-vs-flat pin in this suite that crosses a scan)."""
    model, params = mp
    p_flat, s_flat, data = _pool_with_sessions(mp)
    res_flat = p_flat.replay(_backlog_inputs(s_flat, data))
    mesh = make_mesh(4)
    p_mesh, s_mesh, _ = _pool_with_sessions(mp, mesh=mesh)
    res_mesh = p_mesh.replay(_backlog_inputs(s_mesh, data))
    for i in BACKLOGS:
        np.testing.assert_allclose(
            res_mesh[s_mesh[i]][0], res_flat[s_flat[i]][0],
            rtol=1e-12, atol=1e-14,
        )
    np.testing.assert_allclose(
        p_mesh.state[0], p_flat.state[0], rtol=1e-12, atol=1e-14
    )


def test_pool_replay_guards(mp):
    model, params = mp
    pool, sids, data = _pool_with_sessions(mp)
    with pytest.raises(ValueError, match="at least one session"):
        pool.replay({})
    with pytest.raises(KeyError):
        pool.replay({9999: (data[0][0][:2], data[0][1][:2])})
    with pytest.raises(ValueError, match="backlog u"):
        pool.replay({sids[0]: (data[0][0][0], data[0][1][:1])})  # 1-D u
    with pytest.raises(ValueError, match="backlog y"):
        pool.replay({sids[0]: (data[0][0][:3], data[0][1][:2])})
    with pytest.raises(ValueError, match="replay_buckets"):
        FilterPool(model, params, capacity=2, replay_buckets=(0,))


def test_pool_mesh_validation(mp):
    model, params = mp
    mesh = make_mesh(4)
    with pytest.raises(ValueError, match="multiple of the mesh"):
        FilterPool(model, params, capacity=3, mesh=mesh)
    with pytest.raises(ValueError, match="no axis"):
        FilterPool(model, params, capacity=4, mesh=mesh, axis_name="model")
