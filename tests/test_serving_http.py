"""Reference HTTP transport tests (cbfssm_tpu/serving_http.py).

Two contracts under test:

- `ExportedBatchPredictor` adapts a fixed-batch exported artifact to
  the any-``n`` batch-predictor protocol: rows must equal direct
  `ExportedPredictor` calls chunk by chunk (tail chunk zero-padded,
  key folded per chunk), with the request-level mse recomputed over
  real rows.
- `PredictionServer` puts a MicroBatcher on the wire: serving over
  HTTP must return the exact numbers the predictor produces (keys are
  deterministic: dispatch k uses ``fold_in(PRNGKey(seed), k)``), and
  the error surface must map client mistakes to 4xx, shutdown to 503,
  and predictor failure to 500 — without wedging the listener.

No reference counterpart: the reference is training scripts only;
this is the serving stack's transport layer (docs/SERVING.md).
"""

import io
import json
import os
import subprocess
import sys
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from cbfssm_tpu.serving import MicroBatcher
from cbfssm_tpu.serving_http import ExportedBatchPredictor, PredictionServer
from tests.test_export import _export_cbfssm
from tests.test_microbatcher import DU, DY, SEQ, StubPredictor

# --- ExportedBatchPredictor ------------------------------------------


def _direct_chunks(path, u, y, base_key=None):
    """Expected outputs: direct ExportedPredictor calls, chunked and
    zero-padded exactly as ExportedBatchPredictor documents."""
    from cbfssm_tpu.export import ExportedPredictor, _artifact_base_key

    pred = ExportedPredictor(path)
    b = int(pred.meta["batch"])
    if base_key is None:
        base_key = _artifact_base_key(pred.meta)
    rows = {f: [] for f in pred.meta["output_fields"]}
    for ci, i in enumerate(range(0, u.shape[0], b)):
        uc, yc = u[i : i + b], y[i : i + b]
        pad = b - uc.shape[0]
        if pad:
            uc = np.concatenate([uc, np.zeros_like(uc[:1].repeat(pad, 0))])
            yc = np.concatenate([yc, np.zeros_like(yc[:1].repeat(pad, 0))])
        out = pred(uc, yc, jax.random.fold_in(base_key, ci))
        for f, v in out.items():
            v = np.asarray(v)
            if v.ndim:
                rows[f].append(v[: b - pad])
    return {f: np.concatenate(v) for f, v in rows.items() if v}


def test_exported_batch_rows_match_direct_calls(tmp_path, rng):
    """n=3 through a batch-2 artifact: full chunk + zero-padded tail
    chunk, per-chunk folded keys — every row equals the direct call."""
    _, _, path, _ = _export_cbfssm(tmp_path, batch=2, seq_len=SEQ)
    ebp = ExportedBatchPredictor(path)
    u = rng.normal(size=(3, SEQ, DU))
    y = rng.normal(size=(3, SEQ, DY))
    out = ebp(u, y)
    want = _direct_chunks(path, u, y)
    for f, v in want.items():
        np.testing.assert_allclose(
            np.asarray(getattr(out, f)), v, rtol=1e-12, err_msg=f
        )
    # request-level mse recomputed over the 3 real rows, not per-chunk
    np.testing.assert_allclose(
        float(out.mse), np.mean((want["pred_mean"] - y) ** 2), rtol=1e-12
    )


def test_exported_batch_exact_multiple_and_explicit_key(tmp_path, rng):
    _, _, path, _ = _export_cbfssm(tmp_path, batch=2, seq_len=SEQ)
    ebp = ExportedBatchPredictor(path)
    u = rng.normal(size=(2, SEQ, DU))
    y = rng.normal(size=(2, SEQ, DY))
    key = np.asarray(jax.random.PRNGKey(99))
    out = ebp(u, y, key=key)
    want = _direct_chunks(path, u, y, base_key=key)
    np.testing.assert_allclose(
        np.asarray(out.pred_mean), want["pred_mean"], rtol=1e-12
    )


def test_exported_batch_guards(tmp_path, rng):
    _, _, path, _ = _export_cbfssm(tmp_path, batch=2, seq_len=SEQ)
    ebp = ExportedBatchPredictor(path)
    with pytest.raises(ValueError, match="expected"):
        ebp(rng.normal(size=(1, SEQ + 1, DU)), rng.normal(size=(1, SEQ, DY)))
    with pytest.raises(ValueError, match="match u"):
        ebp(rng.normal(size=(1, SEQ, DU)), rng.normal(size=(2, SEQ, DY)))
    with pytest.raises(ValueError, match="at least one"):
        ebp(np.zeros((0, SEQ, DU)), np.zeros((0, SEQ, DY)))


def test_exported_batch_rejects_voliro_dict_artifact(tmp_path, rng):
    """Dict-predict (Voliro) artifacts can't feed MicroBatcher's
    PredictOutput fan-out; the adapter must refuse at load."""
    from cbfssm_tpu.export import save_exported_predictor
    from cbfssm_tpu.models import Voliro
    from tests.test_other_models import voliro_config

    model = Voliro(voliro_config())
    params = model.init(jax.random.PRNGKey(0))
    path = os.path.join(str(tmp_path), "voliro_artifact")
    save_exported_predictor(
        path, model, params, 1, 6, platforms=("cpu",)
    )
    with pytest.raises(TypeError, match="PredictOutput"):
        ExportedBatchPredictor(path)


# --- PredictionServer over real HTTP ---------------------------------


def _http(method, url, body=None, timeout=30, headers=()):
    req = urllib.request.Request(url, method=method)
    data = None
    if body is not None:
        data = json.dumps(body).encode()
        req.add_header("Content-Type", "application/json")
    for name, value in headers:
        req.add_header(name, value)
    try:
        with urllib.request.urlopen(req, data=data, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture
def stub_server():
    srv = PredictionServer(StubPredictor(), port=0, max_wait_ms=0.0)
    srv.start()
    try:
        yield srv, f"http://{srv.host}:{srv.port}"
    finally:
        srv.close()


def test_http_predict_roundtrip(stub_server, rng):
    """Served numbers equal the stub's deterministic output, row-shaped
    [T, d] (the [1, T, d] future view is unwrapped on the wire)."""
    srv, base = stub_server
    u = rng.normal(size=(SEQ, DU))
    y = rng.normal(size=(SEQ, DY))
    code, resp = _http(
        "POST", base + "/v1/predict", {"u": u.tolist(), "y": y.tolist()}
    )
    assert code == 200
    np.testing.assert_allclose(resp["pred_mean"], u[:, :DY] + 1.0)
    np.testing.assert_allclose(resp["internal_mean"], u)
    np.testing.assert_allclose(
        resp["mse"], np.mean((u[:, :DY] + 1.0 - y) ** 2)
    )
    assert np.asarray(resp["pred_var"]).shape == (SEQ, DY)


def test_http_meta_stats_healthz(stub_server, rng):
    srv, base = stub_server
    assert _http("GET", base + "/healthz") == (200, {"ok": True})
    code, meta = _http("GET", base + "/v1/meta")
    assert code == 200
    assert meta["predictor"] == "StubPredictor"
    assert (meta["seq_len"], meta["dim_u"], meta["dim_y"]) == (SEQ, DU, DY)
    assert meta["dtype"] == "float64"
    u = rng.normal(size=(SEQ, DU))
    _http("POST", base + "/v1/predict",
          {"u": u.tolist(), "y": rng.normal(size=(SEQ, DY)).tolist()})
    code, stats = _http("GET", base + "/v1/stats")
    assert code == 200
    assert stats["requests"] == 1 and stats["batches"] == 1
    # transport counters ride along with the batcher's
    assert stats["http_requests"] >= 3 and stats["http_errors"] == 0


def test_http_error_surface(stub_server, rng):
    srv, base = stub_server
    u = rng.normal(size=(SEQ, DU)).tolist()
    y = rng.normal(size=(SEQ, DY)).tolist()
    cases = [
        ("GET", "/nope", None, 404),
        ("POST", "/nope", {"u": u, "y": y}, 404),
        ("POST", "/v1/predict", {"u": u}, 400),          # missing y
        ("POST", "/v1/predict", [1, 2], 400),            # not an object
        ("POST", "/v1/predict", {"u": "text", "y": y}, 400),
        ("POST", "/v1/predict",
         {"u": np.zeros((SEQ + 1, DU)).tolist(), "y": y}, 400),
    ]
    for method, path, body, want in cases:
        code, resp = _http(method, base + path, body)
        assert code == want, (path, body, resp)
        assert "error" in resp
    # raw non-JSON body
    req = urllib.request.Request(
        f"{base}/v1/predict", data=b"{not json", method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
    code, stats = _http("GET", base + "/v1/stats")
    assert stats["http_errors"] == 7
    # the listener survives all of it
    assert _http("GET", base + "/healthz")[0] == 200


def test_http_batcher_closed_maps_to_503(stub_server, rng):
    srv, base = stub_server
    srv.batcher.close()
    code, resp = _http(
        "POST", base + "/v1/predict",
        {"u": np.zeros((SEQ, DU)).tolist(),
         "y": np.zeros((SEQ, DY)).tolist()},
    )
    assert code == 503 and "closed" in resp["error"]


def test_http_predictor_failure_maps_to_500(rng):
    srv = PredictionServer(StubPredictor(fail=True), port=0, max_wait_ms=0.0)
    srv.start()
    try:
        base = f"http://{srv.host}:{srv.port}"
        code, resp = _http(
            "POST", base + "/v1/predict",
            {"u": np.zeros((SEQ, DU)).tolist(),
             "y": np.zeros((SEQ, DY)).tolist()},
        )
        assert code == 500 and "device on fire" in resp["error"]
        # server still answers after a dispatch failure
        assert _http("GET", base + "/healthz")[0] == 200
    finally:
        srv.close()


def test_http_concurrent_requests_coalesce(rng):
    """Three concurrent HTTP clients land in ONE predictor dispatch
    (the measured 5.6x coalescing win applies to HTTP unchanged), and
    each gets its own row back."""
    pred = StubPredictor()
    srv = PredictionServer(pred, port=0, max_batch=3, max_wait_ms=200.0)
    srv.start()
    try:
        base = f"http://{srv.host}:{srv.port}"
        us = rng.normal(size=(3, SEQ, DU))
        ys = rng.normal(size=(3, SEQ, DY))
        results = [None] * 3

        def client(i):
            results[i] = _http(
                "POST", base + "/v1/predict",
                {"u": us[i].tolist(), "y": ys[i].tolist()},
            )

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (code, resp) in enumerate(results):
            assert code == 200
            np.testing.assert_allclose(
                resp["pred_mean"], us[i][:, :DY] + 1.0
            )
        assert pred.calls == [(3, SEQ, DU)]
    finally:
        srv.close()


def test_http_connection_burst_all_served(rng):
    """48 simultaneous connections (a fleet ticking in lockstep) must
    ALL be served. With the stdlib's default listen backlog of 5,
    connections past the accept queue sit in handshake limbo until
    SYN-ACK retries exhaust and then reset (measured: 3/16 ECONNRESET
    on loopback); _HTTPServer.request_queue_size sizes the queue for
    bursts, so every request here must come back 200 within the
    timeout.

    The reset itself needs the accept thread GIL-starved by handler
    work (observed on the 1-core bench box, not reproducible here
    deterministically), so the backlog size is pinned directly too."""
    srv = PredictionServer(StubPredictor(), port=0, max_wait_ms=0.0)
    srv.start()
    try:
        assert srv._httpd.request_queue_size >= 64
        base = f"http://{srv.host}:{srv.port}"
        n = 48
        barrier = threading.Barrier(n)
        results = [None] * n

        def client(i):
            barrier.wait()
            try:
                results[i] = _http("GET", base + "/healthz", timeout=20)
            except OSError as e:  # reset / timeout — the old failure
                results[i] = e

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r == (200, {"ok": True}) for r in results), [
            r for r in results if r != (200, {"ok": True})
        ]
    finally:
        srv.close()


def test_close_is_idempotent_and_safe_without_serve_loop(rng):
    """close() before any serve loop must not deadlock on
    BaseServer.shutdown()'s never-set event, and double-close is a
    no-op."""
    srv = PredictionServer(StubPredictor(), port=0)
    srv.close()
    srv.close()
    with PredictionServer(StubPredictor(), port=0) as srv2:
        srv2.start()
    srv2.close()


def test_http_serves_exported_artifact_exactly(tmp_path, rng):
    """End-to-end: exported artifact behind HTTP equals the direct
    adapter call with the first dispatch's deterministic key."""
    _, _, path, _ = _export_cbfssm(tmp_path, batch=2, seq_len=SEQ)
    ebp = ExportedBatchPredictor(path)
    u = rng.normal(size=(SEQ, DU))
    y = rng.normal(size=(SEQ, DY))
    want = ebp(
        u[None], y[None],
        key=jax.random.fold_in(jax.random.PRNGKey(0), 0),
    )
    srv = PredictionServer(
        ExportedBatchPredictor(path), port=0, max_wait_ms=0.0, seed=0)
    srv.start()
    try:
        base = f"http://{srv.host}:{srv.port}"
        code, resp = _http(
            "POST", base + "/v1/predict",
            {"u": u.tolist(), "y": y.tolist()},
        )
        assert code == 200
        np.testing.assert_allclose(
            resp["pred_mean"], np.asarray(want.pred_mean)[0], rtol=1e-12
        )
        np.testing.assert_allclose(
            resp["sde"], np.asarray(want.sde)[0], rtol=1e-12
        )
    finally:
        srv.close()


# --- CLI --------------------------------------------------------------


def test_cli_serve_rejects_unknown_dir(tmp_path):
    res = subprocess.run(
        [sys.executable, "-m", "cbfssm_tpu", "serve", str(tmp_path)],
        capture_output=True, text=True,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 2
    assert "neither model_meta.json" in res.stderr


def test_cli_serve_exported_artifact_healthz(tmp_path, rng):
    """`python -m cbfssm_tpu serve <artifact> --port 0` comes up,
    prints its bound address, and answers /healthz and /v1/predict."""
    _, _, path, _ = _export_cbfssm(tmp_path, batch=1, seq_len=SEQ)
    proc = subprocess.Popen(
        [sys.executable, "-m", "cbfssm_tpu", "serve", path, "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu", "JAX_ENABLE_X64": "1"},
    )
    try:
        line = proc.stdout.readline()
        assert "http://" in line, (line, proc.stderr.read())
        base = "http://" + line.split("http://")[1].strip()
        assert _http("GET", base + "/healthz") == (200, {"ok": True})
        code, resp = _http(
            "POST", base + "/v1/predict",
            {"u": rng.normal(size=(SEQ, DU)).tolist(),
             "y": rng.normal(size=(SEQ, DY)).tolist()},
        )
        assert code == 200
        assert np.all(np.isfinite(resp["pred_mean"]))
    finally:
        proc.terminate()
        proc.wait(timeout=30)


# --- FilterServer: online-estimation sessions over HTTP --------------


FDU, FDY, FRECOG = 2, 1, 4  # half_config dims


@pytest.fixture(scope="module")
def half_mp():
    from cbfssm_tpu.models import CBFSSMHALF
    from tests.test_other_models import half_config

    model = CBFSSMHALF(half_config("rnn"))
    return model, model.init(jax.random.PRNGKey(0))


@pytest.fixture
def filter_server(half_mp):
    from cbfssm_tpu.serving import FilterPool
    from cbfssm_tpu.serving_http import FilterServer

    model, params = half_mp
    srv = FilterServer(FilterPool(model, params, capacity=2, seed=0),
                       port=0, max_wait_ms=0.0)
    srv.start()
    try:
        yield srv, f"http://{srv.host}:{srv.port}"
    finally:
        srv.close()


def test_filter_http_lifecycle_matches_bare_pool(filter_server, half_mp, rng):
    """Sequential session ops over HTTP replay the bare pool's exact
    tick schedule (singleton groups): attach, 2 steps, forecast,
    replay, detach — JSON float64 round-trips exactly."""
    from cbfssm_tpu.serving import FilterPool

    model, params = half_mp
    _, base = filter_server
    pa = (rng.normal(size=(FRECOG, FDU)), rng.normal(size=(FRECOG, FDY)))
    steps = [(rng.normal(size=(FDU,)), rng.normal(size=(FDY,)))
             for _ in range(2)]
    u_future = rng.normal(size=(3, FDU))
    backlog = (rng.normal(size=(3, FDU)), rng.normal(size=(3, FDY)))

    bare = FilterPool(model, params, capacity=2, seed=0)
    a0 = bare.attach(*pa)
    want = [bare.step({a0: s})[a0] for s in steps]
    want_fc = bare.forecast({a0: u_future})[a0]
    want_rp = bare.replay({a0: backlog})[a0]

    code, resp = _http("POST", base + "/v1/sessions",
                       {"u_prefix": pa[0].tolist(),
                        "y_prefix": pa[1].tolist()})
    assert code == 200
    sid = resp["sid"]
    assert sid == a0
    for s, (wm, wv) in zip(steps, want):
        code, r = _http("POST", f"{base}/v1/sessions/{sid}/step",
                        {"u_prev": s[0].tolist(), "y_new": s[1].tolist()})
        assert code == 200
        np.testing.assert_array_equal(np.asarray(r["mean"]), wm)
        np.testing.assert_array_equal(np.asarray(r["var"]), wv)
    code, r = _http("POST", f"{base}/v1/sessions/{sid}/forecast",
                    {"u_future": u_future.tolist()})
    assert code == 200
    np.testing.assert_array_equal(np.asarray(r["mean"]), want_fc[0])
    code, r = _http("POST", f"{base}/v1/sessions/{sid}/replay",
                    {"u": backlog[0].tolist(), "y": backlog[1].tolist()})
    assert code == 200
    np.testing.assert_array_equal(np.asarray(r["mean"]), want_rp[0])
    np.testing.assert_array_equal(np.asarray(r["var"]), want_rp[1])
    assert _http("DELETE", f"{base}/v1/sessions/{sid}") == (
        200, {"ok": True})
    code, meta = _http("GET", base + "/v1/meta")
    assert code == 200 and meta["active"] == 0
    assert meta["model"] == "CBFSSMHALF" and meta["capacity"] == 2


def test_filter_http_error_surface(filter_server, rng):
    _, base = filter_server
    pa = (rng.normal(size=(FRECOG, FDU)), rng.normal(size=(FRECOG, FDY)))
    ok = lambda: _http(  # noqa: E731
        "POST", base + "/v1/sessions",
        {"u_prefix": pa[0].tolist(), "y_prefix": pa[1].tolist()})

    # unknown session -> 404 (submit-side: never attached)
    code, resp = _http("POST", base + "/v1/sessions/7/step",
                       {"u_prev": [0.0] * FDU, "y_new": [0.0] * FDY})
    assert code == 404 and "7" in resp["error"]
    # bad shapes -> 400 with the validator's message
    code, resp = ok()
    sid = resp["sid"]
    code, resp = _http("POST", f"{base}/v1/sessions/{sid}/step",
                       {"u_prev": [0.0] * (FDU + 1), "y_new": [0.0] * FDY})
    assert code == 400 and "expected u" in resp["error"]
    # missing field -> 400 naming it
    code, resp = _http("POST", f"{base}/v1/sessions/{sid}/step",
                       {"u_prev": [0.0] * FDU})
    assert code == 400 and "y_new" in resp["error"]
    # unknown operation -> 404
    code, resp = _http("POST", f"{base}/v1/sessions/{sid}/jump",
                       {"u_prev": [0.0] * FDU, "y_new": [0.0] * FDY})
    assert code == 404 and "jump" in resp["error"]
    # pool full (capacity 2) -> 503 retryable
    code, _resp = ok()
    assert code == 200
    code, resp = ok()
    assert code == 503 and "full" in resp["error"]
    # DELETE of an unknown sid -> 404
    code, resp = _http("DELETE", base + "/v1/sessions/99")
    assert code == 404


def test_filter_http_state_failover(filter_server, half_mp, rng):
    """GET /v1/state from the primary restores into a standby server
    (POST /v1/state) that then produces identical filtered moments."""
    from cbfssm_tpu.serving import FilterPool
    from cbfssm_tpu.serving_http import FilterServer

    model, params = half_mp
    _, base = filter_server
    pa = (rng.normal(size=(FRECOG, FDU)), rng.normal(size=(FRECOG, FDY)))
    _code, resp = _http("POST", base + "/v1/sessions",
                        {"u_prefix": pa[0].tolist(),
                         "y_prefix": pa[1].tolist()})
    sid = resp["sid"]
    s1 = (rng.normal(size=(FDU,)), rng.normal(size=(FDY,)))
    s2 = (rng.normal(size=(FDU,)), rng.normal(size=(FDY,)))
    _http("POST", f"{base}/v1/sessions/{sid}/step",
          {"u_prev": s1[0].tolist(), "y_new": s1[1].tolist()})
    code, snap = _http("GET", base + "/v1/state")
    assert code == 200 and snap["slots"] == {str(sid): 0}

    standby = FilterServer(FilterPool(model, params, capacity=2, seed=0),
                           port=0, max_wait_ms=0.0)
    standby.start()
    try:
        sb = f"http://{standby.host}:{standby.port}"
        assert _http("POST", sb + "/v1/state", snap) == (200, {"ok": True})
        body = {"u_prev": s2[0].tolist(), "y_new": s2[1].tolist()}
        code_p, want = _http("POST", f"{base}/v1/sessions/{sid}/step", body)
        code_s, got = _http("POST", f"{sb}/v1/sessions/{sid}/step", body)
        assert code_p == code_s == 200
        assert got == want  # identical JSON numbers: exact resume
    finally:
        standby.close()
    # corrupt snapshot -> 400, not a wedged server
    code, resp = _http("POST", base + "/v1/state", {"x": [0.0]})
    assert code == 400 and "bad state" in resp["error"]


def test_filter_state_npz_failover(filter_server, half_mp, rng):
    """The binary snapshot blob is a pure transport change: shipping it
    primary -> standby via get_state_npz/post_state_npz produces the
    exact moments the JSON snapshot does, and the blob's decoded fields
    equal the JSON snapshot's (same ensemble bytes, same table)."""
    from cbfssm_tpu.serving import FilterPool
    from cbfssm_tpu.serving_http import (
        FilterServer, get_state_npz, post_state_npz,
    )

    model, params = half_mp
    _, base = filter_server
    pa = (rng.normal(size=(FRECOG, FDU)), rng.normal(size=(FRECOG, FDY)))
    _code, resp = _http("POST", base + "/v1/sessions",
                        {"u_prefix": pa[0].tolist(),
                         "y_prefix": pa[1].tolist()})
    sid = resp["sid"]
    s1 = (rng.normal(size=(FDU,)), rng.normal(size=(FDY,)))
    s2 = (rng.normal(size=(FDU,)), rng.normal(size=(FDY,)))
    _http("POST", f"{base}/v1/sessions/{sid}/step",
          {"u_prev": s1[0].tolist(), "y_new": s1[1].tolist()})

    blob = get_state_npz(base)
    # blob fields == JSON snapshot fields (same state, two encodings)
    code, js = _http("GET", base + "/v1/state")
    assert code == 200
    with np.load(io.BytesIO(blob), allow_pickle=False) as z:
        np.testing.assert_array_equal(
            z["x"], np.asarray(js["x"], dtype=z["x"].dtype.name))
        assert z["x"].dtype.name == js["dtype"]
        assert int(z["tick"]) == js["tick"]
        assert int(z["next_sid"]) == js["next_sid"]
        got_slots = {str(s): int(v) for s, v in
                     zip(z["slot_sids"], z["slot_rows"])}
        assert got_slots == js["slots"]

    standby = FilterServer(FilterPool(model, params, capacity=2, seed=0),
                           port=0, max_wait_ms=0.0)
    standby.start()
    try:
        sb = f"http://{standby.host}:{standby.port}"
        post_state_npz(sb, blob)
        body = {"u_prev": s2[0].tolist(), "y_new": s2[1].tolist()}
        code_p, want = _http("POST", f"{base}/v1/sessions/{sid}/step", body)
        code_s, got = _http("POST", f"{sb}/v1/sessions/{sid}/step", body)
        assert code_p == code_s == 200
        assert got == want  # identical JSON numbers: exact resume
    finally:
        standby.close()
    # garbage binary snapshot -> 400, not a wedged server
    import http.client

    srv, _ = filter_server
    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=30)
    try:
        conn.request("POST", "/v1/state", body=b"\x00not-a-zip",
                     headers={"Content-Type": "application/x-npz"})
        r = conn.getresponse()
        assert r.status == 400
        assert "npz" in json.loads(r.read())["error"]
        # valid archive but missing snapshot fields -> 400 with context
        buf = io.BytesIO()
        np.savez(buf, x=np.zeros((2, 3, 4)))
        conn.request("POST", "/v1/state", body=buf.getvalue(),
                     headers={"Content-Type": "application/x-npz"})
        r = conn.getresponse()
        assert r.status == 400
        assert "bad state" in json.loads(r.read())["error"]
        # server still serves after the rejections
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
    finally:
        conn.close()


def test_state_npz_codec_roundtrip(rng):
    """_encode_state_npz/_decode_state_npz are exact inverses through
    a real np.savez round-trip, preserve the ensemble dtype natively,
    and handle the empty session table."""
    from cbfssm_tpu.serving_http import FilterServer

    key = np.asarray([3, 4], np.uint32)
    for dtype in (np.float32, np.float64):
        for slots in ({}, {7: 0, 3: 1}):
            state = (rng.normal(size=(2, 3, 4)).astype(dtype), 11,
                     slots, 9, key)
            buf = io.BytesIO()
            np.savez(buf, **FilterServer._encode_state_npz(state))
            buf.seek(0)
            with np.load(buf, allow_pickle=False) as z:
                got = FilterServer._decode_state_npz(
                    {k: z[k] for k in z.files})
            np.testing.assert_array_equal(got[0], state[0])
            assert got[0].dtype == dtype
            assert got[1:4] == state[1:4]
            np.testing.assert_array_equal(got[4], key)
            assert got[4].dtype == key.dtype  # PRNG key survives natively
    # corrupt table: ragged sid/row vectors must be refused
    bad = FilterServer._encode_state_npz(
        (np.zeros((1, 1, 1)), 0, {1: 0}, 2, key))
    bad["slot_rows"] = np.zeros(2, np.int64)
    with pytest.raises(ValueError, match="mismatch"):
        FilterServer._decode_state_npz(bad)
    # duplicate sids (impossible in JSON — object keys are unique, but
    # the parallel-vector encoding can carry them) must be refused, not
    # silently collapsed into a dict that drops a session mapping
    dup = FilterServer._encode_state_npz(
        (np.zeros((2, 1, 1)), 0, {5: 0, 6: 1}, 7, key))
    dup["slot_sids"] = np.array([5, 5], np.int64)
    with pytest.raises(ValueError, match="duplicate"):
        FilterServer._decode_state_npz(dup)


def test_state_snapshot_malformed_tables(filter_server):
    """Corrupt JSON snapshots must 400 with a diagnostic, never abort
    the connection or restore a silently-dropped session table."""
    srv, base = filter_server
    pool = srv.batcher.pool
    x = np.zeros(
        (pool.capacity, pool.model.samples, pool.model.dim_x)).tolist()
    # int()-aliased sid keys ("5" and "+5") would collapse to one dict
    # entry — the detectable JSON analogue of npz duplicate sids
    code, resp = _http("POST", base + "/v1/state", {
        "x": x, "dtype": "float32",
        "tick": 0, "slots": {"5": 0, "+5": 1}, "next_sid": 6,
    })
    assert code == 400 and "duplicate" in resp["error"]
    # wrong-typed fields (slots a list) must 400, not AttributeError
    # out of the handler with no HTTP reply
    code, resp = _http("POST", base + "/v1/state", {
        "x": x, "dtype": "float32",
        "tick": 0, "slots": [1, 2], "next_sid": 3,
    })
    assert code == 400 and "bad state" in resp["error"]
    # next_sid colliding with a live sid (attach would reissue it)
    code, resp = _http("POST", base + "/v1/state", {
        "x": x, "dtype": "float32",
        "tick": 0, "slots": {"4": 0}, "next_sid": 4,
    })
    assert code == 400 and "next_sid" in resp["error"]
    # server still healthy after the rejections
    code, _resp = _http("GET", base + "/healthz")
    assert code == 200


def test_state_body_limit_scales_with_fleet(filter_server, monkeypatch):
    """POST /v1/state is bounded by the fleet-sized state_body_limit,
    not the predict-request cap — a large pool's own snapshot must
    stay restorable (the cap exists to reject hostile bodies, not
    legitimate failover)."""
    from cbfssm_tpu import serving_http as sh

    srv, base = filter_server
    pool = srv.batcher.pool
    m = pool.model
    raw = (pool.capacity * int(m.samples) * int(m.dim_x)
           * np.dtype(m.dtype).itemsize)
    assert srv.state_body_limit == sh.MAX_BODY_BYTES + 8 * raw
    # wire the limit through the route: shrink it and watch a modest
    # body bounce with 413 (the default predict cap would accept it)
    monkeypatch.setattr(type(srv), "state_body_limit",
                        property(lambda self: 64))
    import http.client

    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=30)
    try:
        body = json.dumps({"x": [0.0] * 64}).encode()
        assert len(body) > 64
        conn.request("POST", "/v1/state", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 413
        assert "exceeds 64" in json.loads(r.read())["error"]
    finally:
        conn.close()


def test_state_accept_q_values(filter_server):
    """`Accept: application/x-npz;q=0` is an RFC 9110 explicit refusal
    of the binary form — the snapshot must come back as JSON; a
    positive q keeps the binary reply; a malformed q falls back to
    JSON (the safe default)."""
    import http.client

    srv, _ = filter_server
    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=30)
    try:
        for accept, want in [
            ("application/x-npz;q=0", "application/json"),
            ("application/json, application/x-npz;q=0", "application/json"),
            ("application/x-npz;q=0.5", "application/x-npz"),
            ("application/x-npz; q=1", "application/x-npz"),
            ("application/x-npz;q=bogus", "application/json"),
        ]:
            conn.request("GET", "/v1/state", headers={"Accept": accept})
            r = conn.getresponse()
            assert r.status == 200
            got = r.headers["Content-Type"].split(";")[0].strip()
            assert got == want, f"Accept: {accept!r} -> {got}"
            r.read()
    finally:
        conn.close()


def test_get_state_npz_rejects_json_reply():
    """A primary that ignores the Accept header (pre-binary build, or a
    proxy stripping it) returns JSON; get_state_npz must fail loudly at
    the GET instead of shipping the blob onward to die as a misleading
    'not a valid .npz' 400 on the standby."""
    import http.server
    import threading

    from cbfssm_tpu.serving_http import get_state_npz

    class _LegacyHandler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = b'{"x": []}'
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), _LegacyHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with pytest.raises(RuntimeError, match="JSON /v1/state"):
            get_state_npz(f"http://127.0.0.1:{srv.server_port}")
    finally:
        srv.shutdown()
        srv.server_close()
        t.join(timeout=10)


def _fabricate_half_dir(tmp_path, half_mp):
    """Trainer-shaped directory (model_meta.json + best.ckpt) without
    training — what `serve --filter` consumes."""
    import optax

    from cbfssm_tpu import model_store
    from cbfssm_tpu.training import checkpoint

    model, params = half_mp
    d = os.path.join(str(tmp_path), "half_run")
    model_store.save_model_meta(d, model, seed=0)
    opt = optax.adam(model.config.learning_rate).init(params)
    checkpoint.save(os.path.join(d, checkpoint.BEST),
                    {"params": params, "opt_state": opt})
    return d


def test_cli_serve_filter_sessions(tmp_path, half_mp, rng):
    """`serve <trained dir> --filter --port 0` end to end: session
    create + step over real HTTP from a fresh process."""
    d = _fabricate_half_dir(tmp_path, half_mp)
    proc = subprocess.Popen(
        [sys.executable, "-m", "cbfssm_tpu", "serve", d, "--filter",
         "--port", "0", "--capacity", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu"},
    )
    try:
        line = proc.stdout.readline()
        assert "filter sessions" in line and "http://" in line, (
            line, proc.stderr.read())
        base = "http://" + line.split("http://")[1].strip()
        pa = (rng.normal(size=(FRECOG, FDU)), rng.normal(size=(FRECOG, FDY)))
        code, resp = _http("POST", base + "/v1/sessions",
                           {"u_prefix": pa[0].tolist(),
                            "y_prefix": pa[1].tolist()})
        assert code == 200
        code, r = _http("POST", f"{base}/v1/sessions/{resp['sid']}/step",
                        {"u_prev": rng.normal(size=(FDU,)).tolist(),
                         "y_new": rng.normal(size=(FDY,)).tolist()})
        assert code == 200
        assert np.all(np.isfinite(r["mean"])) and np.all(
            np.asarray(r["var"]) > 0)
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_cli_serve_filter_rejects_non_streaming_and_artifacts(tmp_path):
    from cbfssm_tpu.__main__ import main

    # no model_meta.json at all
    assert main(["serve", str(tmp_path), "--filter"]) == 2
    # exported artifact dir: --filter needs the in-framework model
    art = os.path.join(str(tmp_path), "art")
    os.makedirs(art)
    with open(os.path.join(art, "meta.json"), "w") as f:
        json.dump({"kind": "predictor"}, f)
    assert main(["serve", art, "--filter"]) == 2


# --- review regressions (keep-alive, error mapping, lifecycle) --------


def test_http_keepalive_survives_error_replies(stub_server, rng):
    """HTTP/1.1 keep-alive: an error reply sent before the request
    body was read must not desync the connection — the unread body
    bytes would otherwise be parsed as the NEXT request's request
    line. One persistent connection: 404-with-body, then 400s, then a
    real predict, all on the same socket."""
    import http.client

    srv, _ = stub_server
    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=30)
    body = json.dumps(
        {"u": rng.normal(size=(SEQ, DU)).tolist(),
         "y": rng.normal(size=(SEQ, DY)).tolist()}).encode()
    try:
        # unknown path WITH a body: pre-fix the body was never drained
        conn.request("POST", "/nope", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 404
        r.read()
        # missing field (body consumed by _read_json) — still keep-alive
        conn.request("POST", "/v1/predict", body=b'{"u": [[0.0]]}',
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        # invalid JSON (read but undecodable)
        conn.request("POST", "/v1/predict", body=b"not json",
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        # the connection is still in sync: a real request succeeds
        conn.request("POST", "/v1/predict", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        out = json.loads(r.read())
        assert np.all(np.isfinite(out["pred_mean"]))
        # and a GET on the same socket too
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200 and json.loads(r.read()) == {"ok": True}
    finally:
        conn.close()


def test_filter_http_state_shape_mismatch_maps_to_400(filter_server):
    """A structurally valid snapshot whose ensemble doesn't match this
    pool's capacity is a permanent client-side mismatch: 400, not 500
    (failover automation treats 5xx as retryable and would loop)."""
    _, base = filter_server
    code, snap = _http("GET", base + "/v1/state")
    assert code == 200
    snap["x"] = snap["x"] + [snap["x"][0]]  # capacity+1 rows
    code, resp = _http("POST", base + "/v1/state", snap)
    assert code == 400
    assert "capacity" in resp["error"] or "shape" in resp["error"]


def test_server_bind_failure_leaks_no_dispatcher_thread():
    """Constructor binds the listener BEFORE building the batcher: a
    port-in-use OSError must not leak a dispatcher thread (retry loops
    would accumulate one orphan thread per attempt)."""
    import socket

    def named(prefix):
        return [t for t in threading.enumerate()
                if t.name.startswith(prefix) and t.is_alive()]

    blocker = socket.socket()
    try:
        blocker.bind(("127.0.0.1", 0))
        blocker.listen(1)
        port = blocker.getsockname()[1]
        before = len(named("cbfssm-microbatcher"))
        with pytest.raises(OSError):
            PredictionServer(StubPredictor(), port=port)
        assert len(named("cbfssm-microbatcher")) == before
    finally:
        blocker.close()


def test_cli_serve_rejects_empty_buckets(tmp_path, half_mp):
    """`serve <dir> --buckets` (no values) must exit 2 with the CLI's
    error contract, not an uncaught ValueError traceback."""
    from cbfssm_tpu.__main__ import main

    d = _fabricate_half_dir(tmp_path, half_mp)
    assert main(["serve", d, "--seq-len", "8", "--buckets"]) == 2


def test_keepalive_survives_success_reply_with_body(stub_server, rng):
    """Success replies drain unread bodies too: a keep-alive GET
    carrying a payload (a common REST-client pattern) must not desync
    the connection for the next request."""
    import http.client

    srv, _ = stub_server
    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=30)
    try:
        conn.request("GET", "/healthz", body=b'{"why": "not"}',
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200 and json.loads(r.read()) == {"ok": True}
        # the connection is still in sync: a real predict succeeds
        body = json.dumps(
            {"u": rng.normal(size=(SEQ, DU)).tolist(),
             "y": rng.normal(size=(SEQ, DY)).tolist()}).encode()
        conn.request("POST", "/v1/predict", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        assert np.all(np.isfinite(json.loads(r.read())["pred_mean"]))
    finally:
        conn.close()


def _recv_http_reply(sock, timeout=30):
    """Read one HTTP reply (headers + Content-Length body) off a raw
    socket; returns (status, headers dict, body bytes)."""
    sock.settimeout(timeout)
    buf = b""
    while b"\r\n\r\n" not in buf:
        chunk = sock.recv(1 << 16)
        assert chunk, f"connection closed mid-headers: {buf!r}"
        buf += chunk
    head, _, rest = buf.partition(b"\r\n\r\n")
    lines = head.decode("latin-1").split("\r\n")
    status = int(lines[0].split()[1])
    headers = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        headers[k.strip().lower()] = v.strip()
    want = int(headers.get("content-length", 0))
    while len(rest) < want:
        chunk = sock.recv(1 << 16)
        assert chunk, "connection closed mid-body"
        rest += chunk
    return status, headers, rest[:want]


def test_chunked_body_rejected_and_connection_closed(stub_server):
    """Transfer-Encoding bodies can't be resynced from Content-Length:
    the server must reply 400 AND advertise + perform a close, never
    leave the chunk framing to be parsed as the next request line."""
    import socket as socket_mod

    srv, _ = stub_server
    with socket_mod.create_connection((srv.host, srv.port), timeout=30) as s:
        s.sendall(b"POST /v1/predict HTTP/1.1\r\n"
                  b"Host: t\r\nTransfer-Encoding: chunked\r\n"
                  b"Content-Type: application/json\r\n\r\n"
                  b"5\r\nhello\r\n0\r\n\r\n")
        status, headers, body = _recv_http_reply(s)
        assert status == 400
        assert "chunked" in json.loads(body)["error"]
        assert headers.get("connection") == "close"
        # server closes (FIN, not request-line garbage): EOF follows
        assert s.recv(1 << 16) == b""


def test_stalled_body_drain_is_bounded(stub_server, monkeypatch):
    """A client that declares a body but never sends it must get its
    error reply within DRAIN_TIMEOUT, not pin the handler thread
    indefinitely (N stalled connections would pin N threads)."""
    import socket as socket_mod
    import time as time_mod

    from cbfssm_tpu import serving_http

    monkeypatch.setattr(serving_http, "DRAIN_TIMEOUT", 0.5)
    srv, _ = stub_server
    with socket_mod.create_connection((srv.host, srv.port), timeout=30) as s:
        t0 = time_mod.monotonic()
        s.sendall(b"POST /nope HTTP/1.1\r\nHost: t\r\n"
                  b"Content-Length: 100\r\n\r\n")  # ...and nothing more
        status, headers, _ = _recv_http_reply(s)
        assert status == 404
        assert time_mod.monotonic() - t0 < 10.0
        assert headers.get("connection") == "close"


def test_oversized_body_client_sees_reply_not_reset(stub_server):
    """Lingering close: the 413 for an oversized body must reach a
    client that is still uploading — a bare close() with unread bytes
    in the receive buffer turns into RST and can destroy the reply."""
    import socket as socket_mod

    from cbfssm_tpu.serving_http import MAX_BODY_BYTES

    srv, _ = stub_server
    with socket_mod.create_connection((srv.host, srv.port), timeout=30) as s:
        s.sendall(b"POST /v1/predict HTTP/1.1\r\nHost: t\r\n"
                  b"Content-Type: application/json\r\n"
                  b"Content-Length: " + str(MAX_BODY_BYTES + 1).encode()
                  + b"\r\n\r\n")
        s.sendall(b"x" * (1 << 16))  # upload under way
        status, _, body = _recv_http_reply(s)
        assert status == 413
        assert "exceeds" in json.loads(body)["error"]
        # keep sending mid-linger; the reply must already be ours and
        # the connection must end in FIN (b""), not ECONNRESET
        try:
            s.sendall(b"y" * (1 << 16))
        except OSError:
            pass  # linger window elapsed: the late upload may fail
        assert s.recv(1 << 16) == b""


def test_concurrent_close_is_idempotent_and_blocking(stub_server):
    """Two concurrent closers: exactly one teardown runs; the loser
    blocks until the batcher is drained rather than returning early."""
    srv, _ = stub_server
    errs = []

    def closer():
        try:
            srv.close()
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    ts = [threading.Thread(target=closer) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
        assert not t.is_alive()
    assert not errs
    assert srv.batcher._closing  # teardown reached the batcher drain


def test_metrics_endpoint_prometheus_format(stub_server, rng):
    """GET /metrics: stats() counters in the Prometheus text exposition
    format — counters carry _total, every line parses as `name value`."""
    import urllib.request

    srv, base = stub_server
    u = rng.normal(size=(SEQ, DU))
    y = rng.normal(size=(SEQ, DY))
    assert _http("POST", base + "/v1/predict",
                 {"u": u.tolist(), "y": y.tolist()})[0] == 200
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    metrics = {}
    for ln in text.strip().split("\n"):
        if ln.startswith("#"):
            assert ln.split()[2].startswith("cbfssm_")  # "# TYPE <name> <kind>"
            continue
        name, val = ln.split()
        metrics[name] = float(val)
    assert metrics["cbfssm_http_requests_total"] >= 1
    assert metrics["cbfssm_requests_total"] >= 1
    assert "cbfssm_mean_batch_size" in metrics  # gauge: no _total
    # parity with the JSON stats view
    code, stats = _http("GET", base + "/v1/stats")
    assert code == 200
    assert metrics["cbfssm_batches_total"] == stats["batches"]


def test_filter_metrics_exposes_active_sessions(filter_server):
    import urllib.request

    _, base = filter_server
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        text = r.read().decode()
    assert "cbfssm_active_sessions " in text


def test_garbage_input_does_not_wedge_listener(stub_server, rng):
    """Raw non-HTTP bytes, oversized request lines, and half requests
    must each be rejected/closed without taking the listener down."""
    import socket as socket_mod

    srv, base = stub_server
    cases = [
        b"\x00\x01\x02\xff garbage that is not HTTP\r\n\r\n",
        b"GET " + b"/" * 70000 + b" HTTP/1.1\r\n\r\n",  # >64k request line
        b"POST /v1/predict HTTP/1.1\r\nBad-Header-No-Colon\r\n\r\n",
        b"",  # connect-and-close
    ]
    for payload in cases:
        with socket_mod.create_connection((srv.host, srv.port),
                                          timeout=30) as s:
            if payload:
                s.sendall(payload)
            else:
                pass
            s.shutdown(socket_mod.SHUT_WR)
            # server replies with a stdlib error or just closes; either
            # way it must reach EOF, not hang
            s.settimeout(30)
            while s.recv(1 << 16):
                pass
    # listener still serves real traffic
    code, resp = _http(
        "POST", base + "/v1/predict",
        {"u": rng.normal(size=(SEQ, DU)).tolist(),
         "y": rng.normal(size=(SEQ, DY)).tolist()},
    )
    assert code == 200 and np.all(np.isfinite(resp["pred_mean"]))


def test_cli_serve_sigterm_clean_shutdown(tmp_path, half_mp):
    """SIGTERM (docker stop / systemd) exits 0 through the same
    ordered shutdown as Ctrl-C, not a dirty -15 kill."""
    import signal

    d = _fabricate_half_dir(tmp_path, half_mp)
    proc = subprocess.Popen(
        [sys.executable, "-m", "cbfssm_tpu", "serve", d, "--filter",
         "--port", "0", "--capacity", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "",
             "JAX_PLATFORMS": "cpu"},
    )
    try:
        line = proc.stdout.readline()
        assert "http://" in line, (line, proc.stderr.read())
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=60)
        assert proc.returncode == 0, (proc.returncode, err)
        assert "shutting down" in out
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


# --- binary (.npz) predict body ---------------------------------------


def test_npz_predict_matches_json_exactly(stub_server, rng):
    """The binary body is a pure transport change: every field must
    equal the JSON endpoint's numbers bitwise (same stub, same key
    schedule — each dispatch folds the batch counter, so compare
    against a JSON request on a fresh counter offset of the SAME
    deterministic stub, which ignores keys)."""
    from cbfssm_tpu.serving_http import post_predict_npz

    srv, base = stub_server
    u = rng.normal(size=(SEQ, DU))
    y = rng.normal(size=(SEQ, DY))
    code, js = _http("POST", base + "/v1/predict",
                     {"u": u.tolist(), "y": y.tolist()})
    assert code == 200
    out = post_predict_npz(base, u, y)
    assert set(out) == set(js)
    for f, v in js.items():
        np.testing.assert_array_equal(
            out[f], np.asarray(v, dtype=out[f].dtype), err_msg=f
        )
    assert out["pred_mean"].shape == (SEQ, DY)
    assert out["mse"].ndim == 0


def test_npz_zip_bomb_rejected_before_materialization(stub_server, rng):
    """A deflate bomb (small wire body, huge DECLARED uncompressed
    size) must be refused with 413 from the zip central directory
    alone — MAX_BODY_BYTES caps only the compressed bytes, and
    np.load would otherwise materialize the declared size."""
    import http.client
    import io
    import zipfile

    from cbfssm_tpu.serving_http import MAX_BODY_BYTES

    # 128 MB of zeros deflates to ~128 KB — wire size passes the
    # Content-Length cap, declared size is 2x over it.
    bomb = io.BytesIO()
    with zipfile.ZipFile(bomb, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("u.npy", b"\x00" * (2 * MAX_BODY_BYTES))
    body = bomb.getvalue()
    assert len(body) < MAX_BODY_BYTES

    srv, _ = stub_server
    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=30)
    try:
        conn.request("POST", "/v1/predict", body=body,
                     headers={"Content-Type": "application/x-npz"})
        r = conn.getresponse()
        assert r.status == 413
        assert "decompresses" in json.loads(r.read())["error"]
        # connection stays usable after the rejection
        buf = io.BytesIO()
        np.savez(buf, u=rng.normal(size=(SEQ, DU)),
                 y=rng.normal(size=(SEQ, DY)))
        conn.request("POST", "/v1/predict", body=buf.getvalue(),
                     headers={"Content-Type": "application/x-npz"})
        assert conn.getresponse().status == 200
    finally:
        conn.close()


def test_npz_predict_keepalive_and_error_surface(stub_server, rng):
    """Binary requests share the JSON path's error mapping and
    keep-alive hygiene: bad archives get 400 (json error body), and
    the connection stays usable."""
    import http.client
    import io

    srv, _ = stub_server
    conn = http.client.HTTPConnection(srv.host, srv.port, timeout=30)
    try:
        # not a zip at all
        conn.request("POST", "/v1/predict", body=b"\x00not-a-zip",
                     headers={"Content-Type": "application/x-npz"})
        r = conn.getresponse()
        assert r.status == 400
        assert "npz" in json.loads(r.read())["error"]
        # valid archive, missing 'y'
        buf = io.BytesIO()
        np.savez(buf, u=rng.normal(size=(SEQ, DU)))
        conn.request("POST", "/v1/predict", body=buf.getvalue(),
                     headers={"Content-Type": "application/x-npz"})
        r = conn.getresponse()
        assert r.status == 400
        assert "'u' and 'y'" in json.loads(r.read())["error"]
        # pickled object arrays must be refused, not executed
        import zipfile

        npy = io.BytesIO()
        np.save(npy, np.array([{"a": 1}], dtype=object),
                allow_pickle=True)
        zbuf = io.BytesIO()
        with zipfile.ZipFile(zbuf, "w") as zf:
            zf.writestr("u.npy", npy.getvalue())
            zf.writestr("y.npy", npy.getvalue())
        conn.request("POST", "/v1/predict", body=zbuf.getvalue(),
                     headers={"Content-Type": "application/x-npz"})
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        # connection still in sync: a real binary request succeeds
        buf = io.BytesIO()
        np.savez(buf, u=rng.normal(size=(SEQ, DU)),
                 y=rng.normal(size=(SEQ, DY)))
        conn.request("POST", "/v1/predict", body=buf.getvalue(),
                     headers={"Content-Type": "application/x-npz"})
        r = conn.getresponse()
        assert r.status == 200
        assert r.headers["Content-Type"] == "application/x-npz"
        with np.load(io.BytesIO(r.read()), allow_pickle=False) as z:
            assert np.all(np.isfinite(z["pred_mean"]))
    finally:
        conn.close()


# --- auth token (r4 verdict weak #4) ---------------------------------


@pytest.fixture
def auth_stub_server():
    srv = PredictionServer(StubPredictor(), port=0, max_wait_ms=0.0,
                           auth_token="s3cret")
    srv.start()
    try:
        yield srv, f"http://{srv.host}:{srv.port}"
    finally:
        srv.close()


AUTH = (("Authorization", "Bearer s3cret"),)


def test_predict_auth_required(auth_stub_server, rng):
    """With a token set, POST /v1/predict 401s without/with-wrong
    credentials (counted as an http error, WWW-Authenticate set) and
    works with the right one; monitoring GETs stay open."""
    srv, base = auth_stub_server
    body = {"u": rng.normal(size=(SEQ, DU)).tolist(),
            "y": rng.normal(size=(SEQ, DY)).tolist()}
    code, resp = _http("POST", base + "/v1/predict", body)
    assert code == 401 and "auth token" in resp["error"]
    code, _ = _http("POST", base + "/v1/predict", body,
                    headers=(("Authorization", "Bearer wrong"),))
    assert code == 401
    # scheme must be Bearer, not a bare token
    code, _ = _http("POST", base + "/v1/predict", body,
                    headers=(("Authorization", "s3cret"),))
    assert code == 401
    req = urllib.request.Request(base + "/v1/predict", method="POST",
                                 data=json.dumps(body).encode())
    req.add_header("Content-Type", "application/json")
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected 401")
    except urllib.error.HTTPError as e:
        assert e.code == 401
        assert e.headers["WWW-Authenticate"] == "Bearer"
        e.read()
    code, _ = _http("POST", base + "/v1/predict", body, headers=AUTH)
    assert code == 200
    # monitoring endpoints stay open (scrapers don't carry the secret)
    for path in ("/healthz", "/v1/meta", "/v1/stats"):
        code, _ = _http("GET", base + path)
        assert code == 200, path
    # four 401s above (missing, wrong, bare-scheme, WWW-Authenticate
    # probe) — each counted as a transport error
    assert srv.stats()["http_errors"] == 4


def test_predict_npz_auth(auth_stub_server, rng):
    """The binary path is gated identically; the client helper carries
    the token."""
    from cbfssm_tpu.serving_http import post_predict_npz

    srv, base = auth_stub_server
    u = rng.normal(size=(SEQ, DU))
    y = rng.normal(size=(SEQ, DY))
    with pytest.raises(urllib.error.HTTPError) as exc:
        post_predict_npz(base, u, y)
    assert exc.value.code == 401
    exc.value.read()
    out = post_predict_npz(base, u, y, auth_token="s3cret")
    np.testing.assert_allclose(out["pred_mean"], u[:, :DY] + 1.0)


@pytest.fixture
def auth_filter_server(half_mp):
    from cbfssm_tpu.serving import FilterPool
    from cbfssm_tpu.serving_http import FilterServer

    model, params = half_mp
    srv = FilterServer(FilterPool(model, params, capacity=2, seed=0),
                       port=0, max_wait_ms=0.0, auth_token="s3cret")
    srv.start()
    try:
        yield srv, f"http://{srv.host}:{srv.port}"
    finally:
        srv.close()


def test_filter_auth_gates_mutating_and_state(auth_filter_server, rng):
    """Every POST/DELETE and the state-leaking GET /v1/state 401
    without the token; the full session lifecycle works with it and
    the binary failover helpers carry it."""
    from cbfssm_tpu.serving_http import get_state_npz, post_state_npz

    srv, base = auth_filter_server
    pa = {"u_prefix": rng.normal(size=(FRECOG, FDU)).tolist(),
          "y_prefix": rng.normal(size=(FRECOG, FDY)).tolist()}

    assert _http("POST", base + "/v1/sessions", pa)[0] == 401
    assert _http("GET", base + "/v1/state")[0] == 401
    assert _http("DELETE", base + "/v1/sessions/0")[0] == 401
    assert _http("POST", base + "/v1/state", {"x": []})[0] == 401
    # monitoring stays open
    for path in ("/healthz", "/v1/meta", "/v1/stats"):
        assert _http("GET", base + path)[0] == 200, path

    code, resp = _http("POST", base + "/v1/sessions", pa, headers=AUTH)
    assert code == 200
    sid = resp["sid"]
    step = {"u_prev": rng.normal(size=(FDU,)).tolist(),
            "y_new": rng.normal(size=(FDY,)).tolist()}
    assert _http("POST", base + f"/v1/sessions/{sid}/step", step)[0] == 401
    code, out = _http("POST", base + f"/v1/sessions/{sid}/step", step,
                      headers=AUTH)
    assert code == 200 and np.all(np.isfinite(out["mean"]))

    with pytest.raises(urllib.error.HTTPError) as exc:
        get_state_npz(base)
    assert exc.value.code == 401
    exc.value.read()
    blob = get_state_npz(base, auth_token="s3cret")
    with pytest.raises(urllib.error.HTTPError) as exc:
        post_state_npz(base, blob)
    assert exc.value.code == 401
    exc.value.read()
    post_state_npz(base, blob, auth_token="s3cret")  # 200 = no raise
    code, _ = _http("DELETE", base + f"/v1/sessions/{sid}", headers=AUTH)
    assert code == 200


def test_no_token_server_stays_open(stub_server, rng):
    """auth_token=None (the default) keeps the surface exactly as
    before — no header needed anywhere."""
    _, base = stub_server
    body = {"u": rng.normal(size=(SEQ, DU)).tolist(),
            "y": rng.normal(size=(SEQ, DY)).tolist()}
    assert _http("POST", base + "/v1/predict", body)[0] == 200
