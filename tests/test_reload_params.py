"""Checkpoint hot-swap (`reload_params`) across the serving stack.

The contract: swap the trained checkpoint under a live server with NO
recompile and NO session loss — the swapped object behaves exactly like
a fresh one built with the new checkpoint and restored from the old
one's state. Exported artifacts refuse by design (they freeze
params+program as one validated unit).
"""

import os
import urllib.error

import jax
import numpy as np
import pytest

from cbfssm_tpu.models import CBFSSMHALF
from cbfssm_tpu.serving import (
    BucketedPredictor,
    CompiledPredictor,
    FilterBatcher,
    FilterPool,
    StreamingFilter,
    validate_params_like,
)
from tests.test_other_models import half_config

DU, DY, RECOG = 2, 1, 4  # half_config dims
SEQ = 8


def _model_and_two_checkpoints():
    model = CBFSSMHALF(half_config("rnn"))
    a = model.init(jax.random.PRNGKey(0))
    b = model.init(jax.random.PRNGKey(42))
    return model, a, b


def test_validate_params_like_errors(rng):
    model, a, b = _model_and_two_checkpoints()
    out = validate_params_like(a, b)
    for la, lb in zip(jax.tree_util.tree_leaves(out),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    leaves, treedef = jax.tree_util.tree_flatten(b)
    bad_shape = jax.tree_util.tree_unflatten(
        treedef, [np.zeros((3, 3))] + list(leaves[1:]))
    with pytest.raises(ValueError, match="leaf 0"):
        validate_params_like(a, bad_shape)
    with pytest.raises(ValueError, match="tree structure"):
        validate_params_like(a, tuple(leaves))
    bad_dtype = jax.tree_util.tree_unflatten(
        treedef,
        [np.asarray(leaves[0], dtype=np.float32)] + list(leaves[1:]))
    with pytest.raises(ValueError, match="leaf 0"):
        validate_params_like(a, bad_dtype)


def test_streaming_filter_hot_swap_matches_fresh(rng):
    """Swap mid-stream == fresh filter with checkpoint B restored from
    the swap-point state (ensemble/counter/key all carry over)."""
    model, a, b = _model_and_two_checkpoints()
    prefix = (rng.normal(size=(1, RECOG, DU)), rng.normal(size=(1, RECOG, DY)))
    steps = [(rng.normal(size=(1, DU)), rng.normal(size=(1, DY)))
             for _ in range(4)]

    f = StreamingFilter(model, a, batch=1)
    f.start(*prefix)
    for s in steps[:2]:
        f.update(*s)
    state_at_swap = f.state
    f.reload_params(b)
    got = [f.update(*s) for s in steps[2:]]

    fresh = StreamingFilter(model, b, batch=1, seed=123)  # different seed:
    fresh.load_state(state_at_swap)  # the key rides in the state
    want = [fresh.update(*s) for s in steps[2:]]
    for (gm, gv), (wm, wv) in zip(got, want):
        np.testing.assert_array_equal(np.asarray(gm), np.asarray(wm))
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))

    # and the swap genuinely changed the dynamics vs staying on A
    stale = StreamingFilter(model, a, batch=1)
    stale.load_state(state_at_swap)
    sm, _ = stale.update(*steps[2])
    assert not np.allclose(np.asarray(got[0][0]), np.asarray(sm))


def test_filter_pool_hot_swap_keeps_sessions(rng):
    model, a, b = _model_and_two_checkpoints()
    prefixes = [(rng.normal(size=(RECOG, DU)), rng.normal(size=(RECOG, DY)))
                for _ in range(2)]
    tick2 = {i: (rng.normal(size=(DU,)), rng.normal(size=(DY,)))
             for i in range(2)}

    pool = FilterPool(model, a, capacity=2, seed=0)
    sids = [pool.attach(*p) for p in prefixes]
    pool.step({sids[0]: tick2[0], sids[1]: tick2[1]})
    snap = pool.state
    pool.reload_params(b)
    got = pool.step({sids[0]: tick2[0], sids[1]: tick2[1]})

    fresh = FilterPool(model, b, capacity=2, seed=7)
    fresh.load_state(snap)
    want = fresh.step({sids[0]: tick2[0], sids[1]: tick2[1]})
    for sid in sids:
        np.testing.assert_array_equal(
            np.asarray(got[sid][0]), np.asarray(want[sid][0]))


def test_filter_batcher_routes_reload(rng):
    """The batcher serializes the swap between dispatches; the served
    stream equals a bare pool driven with the identical schedule and
    swapped at the identical point."""
    model, a, b = _model_and_two_checkpoints()
    prefix = (rng.normal(size=(RECOG, DU)), rng.normal(size=(RECOG, DY)))
    u1, y1 = rng.normal(size=(DU,)), rng.normal(size=(DY,))
    u2, y2 = rng.normal(size=(DU,)), rng.normal(size=(DY,))

    fb = FilterBatcher(FilterPool(model, a, capacity=2, seed=0),
                       max_wait_ms=0.0)
    try:
        sid = fb.attach(*prefix).result()
        first = fb.step(sid, u1, y1).result()
        assert fb.reload_params(b).result() is None
        got = fb.step(sid, u2, y2).result()
    finally:
        fb.close()

    bare = FilterPool(model, a, capacity=2, seed=0)
    bsid = bare.attach(*prefix)
    want_first = bare.step({bsid: (u1, y1)})[bsid]
    bare.reload_params(b)
    want = bare.step({bsid: (u2, y2)})[bsid]
    np.testing.assert_array_equal(np.asarray(first[0]),
                                  np.asarray(want_first[0]))
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))


def test_compiled_and_bucketed_predictor_swap(rng):
    model, a, b = _model_and_two_checkpoints()
    u = rng.normal(size=(1, SEQ, DU))
    y = rng.normal(size=(1, SEQ, DY))
    pred = CompiledPredictor(model, a, batch=1, seq_len=SEQ)
    pred.reload_params(b)
    want = CompiledPredictor(model, b, batch=1, seq_len=SEQ)
    np.testing.assert_array_equal(
        np.asarray(pred(u, y).pred_mean), np.asarray(want(u, y).pred_mean))

    bp = BucketedPredictor(model, a, seq_len=SEQ, buckets=(1, 2))
    bp.reload_params(b)
    u3 = rng.normal(size=(3, SEQ, DU))
    y3 = rng.normal(size=(3, SEQ, DY))
    wb = BucketedPredictor(model, b, seq_len=SEQ, buckets=(1, 2))
    np.testing.assert_array_equal(
        np.asarray(bp(u3, y3).pred_mean), np.asarray(wb(u3, y3).pred_mean))


def test_exported_pool_refuses_reload(tmp_path, rng):
    from cbfssm_tpu.export import ExportedFilterPool
    from cbfssm_tpu.export_pool import save_exported_pool

    model, a, b = _model_and_two_checkpoints()
    path = os.path.join(str(tmp_path), "pool")
    save_exported_pool(path, model, a, capacity=2, platforms=("cpu",))
    pool = ExportedFilterPool(path)
    with pytest.raises(ValueError, match="re-export"):
        pool.reload_params(b)


def test_http_exported_pool_refuses_reload(tmp_path, rng):
    """Over HTTP too: an exported-pool FilterServer maps the refusal to
    400 with the re-export message (not a 500)."""
    from cbfssm_tpu.export import ExportedFilterPool
    from cbfssm_tpu.export_pool import save_exported_pool
    from cbfssm_tpu.serving_http import FilterServer, post_params_npz

    model, a, b = _model_and_two_checkpoints()
    path = os.path.join(str(tmp_path), "pool")
    save_exported_pool(path, model, a, capacity=2, platforms=("cpu",))
    with FilterServer(ExportedFilterPool(path), port=0,
                      max_wait_ms=0.0) as srv:
        srv.start()
        base = f"http://{srv.host}:{srv.port}"
        with pytest.raises(urllib.error.HTTPError) as exc:
            # the exported pool's params are a flat tuple; its leaves
            # frame correctly, so the refusal happens in reload itself
            post_params_npz(base, tuple(np.asarray(x)
                                        for x in srv.batcher.pool.params))
        assert exc.value.code == 400
        assert b"re-export" in exc.value.read()


# --- over HTTP --------------------------------------------------------


def test_http_filter_params_hot_swap(rng):
    from cbfssm_tpu.serving_http import FilterServer, post_params_npz
    from tests.test_serving_http import _http

    model, a, b = _model_and_two_checkpoints()
    with FilterServer(FilterPool(model, a, capacity=2, seed=0),
                      port=0, max_wait_ms=0.0) as srv:
        srv.start()
        base = f"http://{srv.host}:{srv.port}"
        code, resp = _http("POST", base + "/v1/sessions", {
            "u_prefix": rng.normal(size=(RECOG, DU)).tolist(),
            "y_prefix": rng.normal(size=(RECOG, DY)).tolist()})
        assert code == 200
        sid = resp["sid"]
        step = {"u_prev": rng.normal(size=(DU,)).tolist(),
                "y_new": rng.normal(size=(DY,)).tolist()}
        _http("POST", base + f"/v1/sessions/{sid}/step", step)
        # JSON body on /v1/params -> 415 (binary-only by design)
        code, resp = _http("POST", base + "/v1/params", {"p0": [1.0]})
        assert code == 415 and "binary" in resp["error"]
        post_params_npz(base, b)
        code, out = _http("POST", base + f"/v1/sessions/{sid}/step", step)
        assert code == 200

    # the served numbers after the swap equal a bare pool with B
    # restored at the same point (replay the same schedule)
    pool = FilterPool(model, a, capacity=2, seed=0)
    rng2 = np.random.default_rng(0)
    psid = pool.attach(rng2.normal(size=(RECOG, DU)),
                       rng2.normal(size=(RECOG, DY)))
    del psid  # schedule parity is covered by the batcher pins; here we
    # only assert the HTTP path swapped successfully and kept serving
    assert np.all(np.isfinite(out["mean"]))


def test_http_prediction_params_hot_swap(rng):
    from tests.test_microbatcher import StubPredictor
    from cbfssm_tpu.serving_http import PredictionServer, post_params_npz
    from tests.test_serving_http import _http

    model, a, b = _model_and_two_checkpoints()
    pred = BucketedPredictor(model, a, seq_len=SEQ, buckets=(1,))
    with PredictionServer(pred, port=0, max_wait_ms=0.0) as srv:
        srv.start()
        base = f"http://{srv.host}:{srv.port}"
        u = rng.normal(size=(SEQ, DU))
        y = rng.normal(size=(SEQ, DY))
        post_params_npz(base, b)
        code, resp = _http("POST", base + "/v1/predict",
                           {"u": u.tolist(), "y": y.tolist()})
        assert code == 200
        want = BucketedPredictor(model, b, seq_len=SEQ, buckets=(1,))
        # MicroBatcher key policy: dispatch k uses fold_in(base, k);
        # this is the server's first dispatch
        k0 = jax.random.fold_in(jax.random.PRNGKey(0), 0)
        np.testing.assert_allclose(
            resp["pred_mean"],
            np.asarray(want(u[None], y[None], key=k0).pred_mean)[0],
            rtol=1e-12)
        # wrong-shape checkpoint -> 400 with the named leaf
        leaves, treedef = jax.tree_util.tree_flatten(b)
        bad = jax.tree_util.tree_unflatten(
            treedef, [np.zeros((3, 3))] + list(leaves[1:]))
        with pytest.raises(urllib.error.HTTPError) as exc:
            post_params_npz(base, bad)
        assert exc.value.code == 400
        exc.value.read()

    # an exported-artifact server refuses with the re-export message
    stub_srv = PredictionServer(StubPredictor(), port=0, max_wait_ms=0.0)
    stub_srv.start()
    try:
        sbase = f"http://{stub_srv.host}:{stub_srv.port}"
        with pytest.raises(urllib.error.HTTPError) as exc:
            post_params_npz(sbase, b)
        assert exc.value.code == 400
        body = exc.value.read()
        assert b"re-export" in body or b"exported" in body
    finally:
        stub_srv.close()
