"""Measure the whole-fleet failover snapshot over HTTP: JSON vs .npz.

Scenario: one primary FilterServer with a full session table at
production capacity (CBFSSMHALF fleet shape, S=50 particles), one
standby. Failover = GET /v1/state from the primary, POST it to the
standby. Both legs are measured per format:

- JSON (reference body): the ensemble crosses the wire as float text —
  ``tolist()`` + ``json.dumps`` on the primary, ``json.loads`` +
  ``np.asarray`` on the standby, all on the 1-core host.
- .npz (binary body): ``get_state_npz``/``post_state_npz`` — numpy's C
  serialization, dtype shipped natively.

Both formats pay the same device readback (pool.state) and device_put
(load_state), so the delta isolates the transport encode cost. Restores
are verified identical: after each round-trip the standby's decoded
ensemble must equal the primary's bitwise.

Usage: python scripts/bench_http_state.py   (ambient env = real TPU)
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.bench_filter_pool import build

CAPACITY = int(os.environ.get("CBFSSM_HTTP_BENCH_CAPACITY", 1024))
REPS = int(os.environ.get("CBFSSM_HTTP_BENCH_REPS", 5))


def _http(base, method, path, raw=None):
    """Ship raw bytes: failover automation forwards the GET blob to the
    standby unparsed in BOTH formats, so neither pays a client-side
    re-encode — the measured delta is purely the servers' encode/decode
    plus wire size."""
    import urllib.request

    req = urllib.request.Request(base + path, method=method, data=raw)
    if raw is not None:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.read()


def main():
    from cbfssm_tpu.serving import FilterPool
    from cbfssm_tpu.serving_http import (
        FilterServer, get_state_npz, post_state_npz,
    )

    model, params = build()
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    primary = FilterPool(model, params, capacity=CAPACITY, seed=0)
    standby_pool = FilterPool(model, params, capacity=CAPACITY, seed=0)
    print(f"pool compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # fabricate a full fleet: every slot active, realistic float noise
    # (worst-case JSON text — near-uniform mantissas, ~17 sig digits)
    x = rng.normal(size=(CAPACITY, model.samples, model.dim_x)).astype(
        model.dtype
    )
    full_state = (x, 12345, {sid: sid for sid in range(CAPACITY)}, CAPACITY)
    primary.load_state(full_state)

    srv = FilterServer(primary, port=0, max_wait_ms=0.0)
    standby = FilterServer(standby_pool, port=0, max_wait_ms=0.0)
    srv.start()
    standby.start()
    base = f"http://{srv.host}:{srv.port}"
    sbase = f"http://{standby.host}:{standby.port}"
    results = {}
    try:
        # warm both paths once (lazy imports, route setup)
        post_state_npz(sbase, get_state_npz(base))
        _http(sbase, "POST", "/v1/state", _http(base, "GET", "/v1/state"))

        for fmt in ("json", "npz"):
            get_s, post_s, sizes = [], [], []
            for _rep in range(REPS):
                if fmt == "json":
                    t0 = time.perf_counter()
                    blob = _http(base, "GET", "/v1/state")
                    t1 = time.perf_counter()
                    _http(sbase, "POST", "/v1/state", blob)
                    t2 = time.perf_counter()
                else:
                    t0 = time.perf_counter()
                    blob = get_state_npz(base)
                    t1 = time.perf_counter()
                    post_state_npz(sbase, blob)
                    t2 = time.perf_counter()
                get_s.append(t1 - t0)
                post_s.append(t2 - t1)
                sizes.append(len(blob))
                print(f"{fmt} rep {_rep}: get {1e3 * (t1 - t0):.0f} ms, "
                      f"post {1e3 * (t2 - t1):.0f} ms, "
                      f"{sizes[-1]} bytes", file=sys.stderr)
            # exact restore: standby ensemble == primary ensemble
            sx = standby_pool.state[0]
            np.testing.assert_array_equal(sx, x)
            results[fmt] = {
                "get_ms": round(1e3 * float(np.median(get_s)), 1),
                "post_ms": round(1e3 * float(np.median(post_s)), 1),
                "roundtrip_ms": round(
                    1e3 * float(np.median(np.add(get_s, post_s))), 1
                ),
                "body_bytes": int(np.median(sizes)),
            }
    finally:
        srv.close()
        standby.close()

    out = {
        "shape": f"cbfssmhalf_fleet{CAPACITY}_S{model.samples}"
                 f"_dx{model.dim_x}_f32",
        "capacity": CAPACITY,
        "ensemble_floats": int(np.prod(x.shape)),
        "reps": REPS,
        "json": results["json"],
        "npz": results["npz"],
        "speedup_roundtrip": round(
            results["json"]["roundtrip_ms"] / results["npz"]["roundtrip_ms"],
            2,
        ),
        "wire_ratio": round(
            results["json"]["body_bytes"] / results["npz"]["body_bytes"], 2
        ),
        "script": "scripts/bench_http_state.py",
    }
    print(json.dumps(out))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "http_state_latency.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
