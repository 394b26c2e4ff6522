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


def _http(method, url, body=None, timeout=30):
    req = urllib.request.Request(url, method=method)
    data = None
    if body is not None:
        data = json.dumps(body).encode()
        req.add_header("Content-Type", "application/json")
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
