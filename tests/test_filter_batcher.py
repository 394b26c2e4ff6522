"""FilterBatcher: concurrent per-session operations -> pooled dispatches.

Contracts pinned here: sequential operations through the batcher are
bitwise the bare-pool schedule; coalesced groups are bitwise a replay
of the SAME groups into a bare pool (the tick-key contract); same-
session FIFO (a session never rides one dispatch twice); per-item
error isolation inside a group; lifecycle/failover items serialize
with fleet dispatches; close/drain semantics.

No reference counterpart: the reference is training scripts only; this
is the serving stack's online-estimation front-end
(cf. cbfssm/run/*.py — no deployment layer exists there).
"""

import threading

import jax
import numpy as np
import pytest

from cbfssm_tpu.models import CBFSSMHALF
from cbfssm_tpu.serving import FilterBatcher, FilterPool
from tests.test_other_models import half_config

RECOG = 4  # half_config recog_len
DU, DY = 2, 1


@pytest.fixture(scope="module")
def mp():
    model = CBFSSMHALF(half_config("rnn"))
    return model, model.init(jax.random.PRNGKey(0))


def prefix(rng):
    return rng.normal(size=(RECOG, DU)), rng.normal(size=(RECOG, DY))


def test_sequential_ops_match_bare_pool(mp, rng):
    """Awaiting each future before the next submission makes every
    group a singleton, so the batcher must replay the bare pool's
    exact tick schedule — attach, 3 steps, forecast, replay, detach."""
    model, params = mp
    pa = prefix(rng)
    steps = [(rng.normal(size=(DU,)), rng.normal(size=(DY,)))
             for _ in range(3)]
    u_future = rng.normal(size=(5, DU))
    backlog = (rng.normal(size=(4, DU)), rng.normal(size=(4, DY)))

    bare = FilterPool(model, params, capacity=2, seed=0)
    a0 = bare.attach(*pa)
    want = [bare.step({a0: s})[a0] for s in steps]
    want_fc = bare.forecast({a0: u_future})[a0]
    want_rp = bare.replay({a0: backlog})[a0]

    with FilterBatcher(FilterPool(model, params, capacity=2, seed=0),
                       max_wait_ms=0.0) as fb:
        a = fb.attach(*pa).result()
        assert a == a0
        got = [fb.step(a, *s).result() for s in steps]
        got_fc = fb.forecast(a, u_future).result()
        got_rp = fb.replay(a, *backlog).result()
        fb.detach(a).result()
        assert fb.pool.active == 0
    for (gm, gv), (wm, wv) in zip(got, want):
        np.testing.assert_array_equal(gm, wm)
        np.testing.assert_array_equal(gv, wv)
    np.testing.assert_array_equal(got_fc[0], want_fc[0])
    np.testing.assert_array_equal(got_fc[1], want_fc[1])
    np.testing.assert_array_equal(got_rp[0], want_rp[0])
    np.testing.assert_array_equal(got_rp[1], want_rp[1])


def test_coalesced_groups_match_group_replay(mp, rng):
    """Whatever grouping the dispatcher forms, results must be bitwise
    what a bare pool produces when fed the SAME group dicts in the
    same order — recorded by instrumenting pool.step."""
    model, params = mp
    prefixes = [prefix(rng) for _ in range(3)]
    inputs = [(rng.normal(size=(DU,)), rng.normal(size=(DY,)))
              for _ in range(3)]

    pool = FilterPool(model, params, capacity=3, seed=0)
    recorded = []
    orig_step = pool.step
    pool.step = lambda d: (recorded.append(dict(d)) or orig_step(d))

    # generous window: the three submissions land in one collect sweep
    fb = FilterBatcher(pool, max_wait_ms=1000.0)
    try:
        sids = [fb.attach(*p).result() for p in prefixes]
        futs = [fb.step(s, u, y) for s, (u, y) in zip(sids, inputs)]
        got = {s: f.result() for s, f in zip(sids, futs)}
    finally:
        fb.close()
    assert fb.stats()["max_group_seen"] >= 3  # they did coalesce

    bare = FilterPool(model, params, capacity=3, seed=0)
    remap = {s: bare.attach(*p) for s, p in zip(sids, prefixes)}
    want = {}
    for grp in recorded:
        out = bare.step({remap[s]: uy for s, uy in grp.items()})
        want.update({s: out[remap[s]] for s in grp})
    for s in sids:
        np.testing.assert_array_equal(got[s][0], want[s][0])
        np.testing.assert_array_equal(got[s][1], want[s][1])


def test_same_session_fifo_uses_two_ticks(mp, rng):
    """Two pending steps of ONE session must not share a dispatch:
    they resolve to the bare pool's sequential two-tick schedule."""
    model, params = mp
    pa = prefix(rng)
    s1 = (rng.normal(size=(DU,)), rng.normal(size=(DY,)))
    s2 = (rng.normal(size=(DU,)), rng.normal(size=(DY,)))

    bare = FilterPool(model, params, capacity=2, seed=0)
    a0 = bare.attach(*pa)
    w1 = bare.step({a0: s1})[a0]
    w2 = bare.step({a0: s2})[a0]

    with FilterBatcher(FilterPool(model, params, capacity=2, seed=0),
                       max_wait_ms=1000.0) as fb:
        a = fb.attach(*pa).result()
        f1, f2 = fb.step(a, *s1), fb.step(a, *s2)
        g1, g2 = f1.result(), f2.result()
        assert fb.pool._tick == 2
    np.testing.assert_array_equal(g1[0], w1[0])
    np.testing.assert_array_equal(g2[0], w2[0])
    np.testing.assert_array_equal(g2[1], w2[1])


def test_unknown_session_fails_only_its_future(mp, rng):
    model, params = mp
    with FilterBatcher(FilterPool(model, params, capacity=2, seed=0),
                       max_wait_ms=1000.0) as fb:
        a = fb.attach(*prefix(rng)).result()
        good = fb.step(a, rng.normal(size=(DU,)), rng.normal(size=(DY,)))
        bad = fb.step(999, rng.normal(size=(DU,)), rng.normal(size=(DY,)))
        mean, var = good.result()
        assert np.all(np.isfinite(mean)) and np.all(var > 0)
        with pytest.raises(KeyError, match="999"):
            bad.result()
        assert fb.stats()["errors"] == 1


def test_submit_side_validation(mp, rng):
    model, params = mp
    with FilterBatcher(FilterPool(model, params, capacity=1, seed=0),
                       max_wait_ms=0.0) as fb:
        with pytest.raises(ValueError, match="u_prefix"):
            fb.attach(np.zeros((RECOG + 1, DU)), np.zeros((RECOG, DY)))
        a = fb.attach(*prefix(rng)).result()
        with pytest.raises(ValueError, match="expected u"):
            fb.step(a, np.zeros((DU + 1,)), np.zeros((DY,)))
        with pytest.raises(ValueError, match="u_future"):
            fb.forecast(a, np.zeros((0, DU)))
        with pytest.raises(ValueError, match="backlog y"):
            fb.replay(a, np.zeros((3, DU)), np.zeros((2, DY)))


def test_mixed_horizon_forecasts_both_resolve(mp, rng):
    """Different horizons cannot share the pool's forecast program;
    the boundary must split them, not error."""
    model, params = mp
    with FilterBatcher(FilterPool(model, params, capacity=2, seed=0),
                       max_wait_ms=1000.0) as fb:
        a = fb.attach(*prefix(rng)).result()
        b = fb.attach(*prefix(rng)).result()
        fa = fb.forecast(a, rng.normal(size=(3, DU)))
        fc = fb.forecast(b, rng.normal(size=(5, DU)))
        assert fa.result()[0].shape == (3, DY)
        assert fc.result()[0].shape == (5, DY)


def test_state_roundtrip_through_batcher(mp, rng):
    """Failover snapshot taken through the batcher restores into a
    fresh pool+batcher and continues bitwise identically."""
    model, params = mp
    pa = prefix(rng)
    s1 = (rng.normal(size=(DU,)), rng.normal(size=(DY,)))
    s2 = (rng.normal(size=(DU,)), rng.normal(size=(DY,)))

    with FilterBatcher(FilterPool(model, params, capacity=2, seed=0),
                       max_wait_ms=0.0) as fb:
        a = fb.attach(*pa).result()
        fb.step(a, *s1).result()
        snap = fb.state().result()
        want = fb.step(a, *s2).result()

    with FilterBatcher(FilterPool(model, params, capacity=2, seed=0),
                       max_wait_ms=0.0) as fb2:
        fb2.load_state(snap).result()
        got = fb2.step(a, *s2).result()
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_close_semantics(mp, rng):
    model, params = mp
    pool = FilterPool(model, params, capacity=1, seed=0)
    fb = FilterBatcher(pool, max_wait_ms=0.0)
    a = fb.attach(*prefix(rng)).result()
    fb.close()
    fb.close()  # idempotent
    with pytest.raises(RuntimeError, match="closed"):
        fb.step(a, np.zeros((DU,)), np.zeros((DY,)))

    # drain=False fails pending futures instead of serving them; stall
    # the dispatcher on a live step so the probe stays queued behind it
    fb2 = FilterBatcher(FilterPool(model, params, capacity=1, seed=0),
                        max_wait_ms=0.0)
    b = fb2.attach(*prefix(rng)).result()
    gate, entered = threading.Event(), threading.Event()
    orig = fb2.pool.step

    def slow_step(d):
        entered.set()
        gate.wait(timeout=30)
        return orig(d)

    fb2.pool.step = slow_step
    running = fb2.step(b, np.zeros((DU,)), np.zeros((DY,)))
    assert entered.wait(timeout=30)  # first step is mid-dispatch ...
    pending = fb2.step(b, np.ones((DU,)), np.ones((DY,)))  # ... this queues
    closer = threading.Thread(target=lambda: fb2.close(drain=False))
    closer.start()  # drains `pending` with an error, then joins ...
    while not pending.done():
        pass
    gate.set()  # ... once the stalled dispatch is released
    closer.join(timeout=30)
    assert running.result() is not None  # already dispatched: served
    with pytest.raises(RuntimeError, match="closed before dispatch"):
        pending.result()


def test_stats_shape(mp, rng):
    model, params = mp
    with FilterBatcher(FilterPool(model, params, capacity=1, seed=0),
                       max_wait_ms=0.0) as fb:
        a = fb.attach(*prefix(rng)).result()
        fb.step(a, np.zeros((DU,)), np.zeros((DY,))).result()
        s = fb.stats()
    assert s["requests"] == 2 and s["dispatches"] == 2
    assert s["errors"] == 0 and s["mean_group_size"] == 1.0
    assert s["max_group_seen"] == 1 and s["mean_wait_ms"] >= 0.0


def test_lifecycle_wait_counts_in_mean(mp, rng):
    """Lifecycle items are in mean_wait_ms's grouped_ops denominator,
    so their (strictly positive) queue wait must be in the numerator —
    lifecycle-only traffic used to read exactly 0.0 ms."""
    model, params = mp
    with FilterBatcher(FilterPool(model, params, capacity=1, seed=0),
                       max_wait_ms=0.0) as fb:
        sid = fb.attach(*prefix(rng)).result()
        fb.detach(sid).result()
        s = fb.stats()
    assert s["dispatches"] == 2 and s["mean_group_size"] == 1.0
    assert s["mean_wait_ms"] > 0.0
