"""Measure the full HTTP online-estimation path on-chip.

Scenario: 16 estimator clients stream updates to one FilterServer
(CBFSSMHALF, S=50 particles, M=100 inducing points — the
bench_filter_pool fleet shape). Baseline: the same clients strictly
sequential (await each response before any other client sends), so
every step rides its own pooled dispatch — N x TICKS dispatch floors.
Concurrent: all clients in flight at once; FilterBatcher coalesces
same-tick steps from different sessions into grouped dispatches. The
delta measures what the HTTP session layer preserves of the pool's
dispatches-saved x ~29 ms floor economics — with the entire JSON/socket
stack in the loop, not a lab harness.

Usage: python scripts/bench_http_filter.py   (ambient env = real TPU)
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.bench_filter_pool import build

N_CLIENTS = int(os.environ.get("CBFSSM_HTTP_BENCH_CLIENTS", 16))
TICKS = int(os.environ.get("CBFSSM_HTTP_BENCH_TICKS", 20))
REPS = int(os.environ.get("CBFSSM_HTTP_BENCH_REPS", 3))


def _call(base, method, path, body):
    import urllib.request

    req = urllib.request.Request(base + path, method=method)
    data = json.dumps(body).encode() if body is not None else None
    if data:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, data=data, timeout=300) as r:
        return json.loads(r.read())


def main():
    from cbfssm_tpu.serving import FilterPool
    from cbfssm_tpu.serving_http import FilterServer

    model, params = build()
    rng = np.random.default_rng(0)
    recog = int(model.config.recog_len)
    prefixes = [
        (rng.normal(size=(recog, model.dim_u)).astype(np.float32),
         rng.normal(size=(recog, model.dim_y)).astype(np.float32))
        for _ in range(N_CLIENTS)
    ]
    ticks = [
        [(rng.normal(size=model.dim_u).astype(np.float32),
          rng.normal(size=model.dim_y).astype(np.float32))
         for _ in range(N_CLIENTS)]
        for _ in range(TICKS + 1)
    ]

    t0 = time.perf_counter()
    pool = FilterPool(model, params, capacity=N_CLIENTS, seed=0)
    print(f"pool compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    srv = FilterServer(pool, port=0, max_wait_ms=10.0)
    srv.start()
    base = f"http://{srv.host}:{srv.port}"
    try:
        sids = [
            _call(base, "POST", "/v1/sessions",
                  {"u_prefix": u.tolist(), "y_prefix": y.tolist()})["sid"]
            for u, y in prefixes
        ]
        # warm (one-time program staging)
        for sid, (u, y) in zip(sids, ticks[0]):
            _call(base, "POST", f"/v1/sessions/{sid}/step",
                  {"u_prev": u.tolist(), "y_new": y.tolist()})

        # sequential baseline: one request in flight fleet-wide — with
        # the coalescing window OFF (a singleton dispatch would
        # otherwise idle out the full max_wait first; best config for
        # each contender)
        srv.batcher.max_wait = 0.0
        seq = []
        for _rep in range(REPS):
            t0 = time.perf_counter()
            for tick in ticks[1:]:
                for sid, (u, y) in zip(sids, tick):
                    _call(base, "POST", f"/v1/sessions/{sid}/step",
                          {"u_prev": u.tolist(), "y_new": y.tolist()})
            seq.append((time.perf_counter() - t0) / TICKS)
            print(f"seq rep {_rep}: {1e3 * seq[-1]:.1f} ms/tick",
                  file=sys.stderr)
        seq_ms = 1e3 * float(np.median(seq))

        # concurrent: every client has one request in flight
        srv.batcher.max_wait = 10.0 / 1e3

        def client(ci, sid, barrier, out, errs):
            try:
                for t in range(TICKS):
                    barrier.wait()
                    u, y = ticks[1 + t][ci]
                    out[ci] = _call(
                        base, "POST", f"/v1/sessions/{sid}/step",
                        {"u_prev": u.tolist(), "y_new": y.tolist()})
            except threading.BrokenBarrierError:
                pass  # a peer failed; unwind quietly
            except Exception as e:
                errs.append((ci, e))
                barrier.abort()  # release peers so join() returns

        d0 = srv.batcher.stats()["dispatches"]
        conc = []
        for _rep in range(REPS):
            barrier = threading.Barrier(N_CLIENTS)
            out = [None] * N_CLIENTS
            errs = []
            threads = [
                threading.Thread(target=client,
                                 args=(ci, sid, barrier, out, errs))
                for ci, sid in enumerate(sids)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            if errs:
                raise RuntimeError(f"client(s) failed: {errs}") from errs[0][1]
            conc.append((time.perf_counter() - t0) / TICKS)
            print(f"conc rep {_rep}: {1e3 * conc[-1]:.1f} ms/tick",
                  file=sys.stderr)
            assert all(np.isfinite(o["mean"]).all() for o in out)
        conc_ms = 1e3 * float(np.median(conc))
        s = srv.batcher.stats()
        steps_served = N_CLIENTS * TICKS * REPS
        dispatches = s["dispatches"] - d0
        print(json.dumps({
            "n_clients": N_CLIENTS,
            "ticks_per_rep": TICKS,
            "sequential_ms_per_tick": round(seq_ms, 2),
            "concurrent_ms_per_tick": round(conc_ms, 2),
            "speedup": round(seq_ms / conc_ms, 2),
            "concurrent_dispatches": dispatches,
            "concurrent_steps": steps_served,
            "mean_group_size": round(steps_served / dispatches, 2),
        }))
    finally:
        srv.close()


if __name__ == "__main__":
    main()
