"""Measure the full HTTP prediction path on-chip.

Scenario: 32 single-sequence clients POST /v1/predict to one
PredictionServer (RoboMove serving shape, 300 steps, S=50, M=100 — the
bench_microbatch.py configuration, now with the entire JSON/socket
stack in the loop). Baseline: the same clients strictly sequential
(await each response before the next sends), so every request rides
its own dispatch — N dispatch floors plus N JSON round-trips.
Concurrent: all clients in flight at once; handler threads block on
MicroBatcher futures and same-window requests coalesce into bucketed
dispatches. The delta measures what the HTTP transport preserves of
the direct MicroBatcher coalescing economics (BENCHMARKS.md
"Microbatched serving": 5.6x at 32 clients, lab harness).

Usage: python scripts/bench_http_predict.py   (ambient env = real TPU)
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cbfssm_tpu.serving import BucketedPredictor
from cbfssm_tpu.serving_http import PredictionServer
from scripts.profile_mfu import SHAPES, build_cbfssm_parts

N_CLIENTS = int(os.environ.get("CBFSSM_HTTP_BENCH_CLIENTS", 32))
SEQ_LEN = 300
REPS = int(os.environ.get("CBFSSM_HTTP_BENCH_REPS", 3))
WAIT_MS = float(os.environ.get("CBFSSM_HTTP_BENCH_WAIT_MS", 20.0))
# 'json' (reference body) or 'npz' (binary body — numpy C serialization)
FORMAT = os.environ.get("CBFSSM_HTTP_BENCH_FORMAT", "json")


def _post_predict(base, u, y):
    if FORMAT == "npz":
        from cbfssm_tpu.serving_http import post_predict_npz

        return post_predict_npz(base, u, y, timeout=600)
    import urllib.request

    req = urllib.request.Request(base + "/v1/predict", method="POST")
    req.add_header("Content-Type", "application/json")
    data = json.dumps({"u": u.tolist(), "y": y.tolist()}).encode()
    with urllib.request.urlopen(req, data=data, timeout=600) as r:
        return json.loads(r.read())


def main():
    shape = SHAPES["robomove"]
    model, params, _tx, _opt, _u, _y = build_cbfssm_parts(shape)
    rng = np.random.default_rng(0)
    reqs = [
        (
            rng.normal(size=(SEQ_LEN, shape["dim_u"])).astype(np.float32),
            rng.normal(size=(SEQ_LEN, shape["dim_y"])).astype(np.float32),
        )
        for _ in range(N_CLIENTS)
    ]

    t0 = time.perf_counter()
    bp = BucketedPredictor(
        model, params, seq_len=SEQ_LEN, buckets=(1, 8, N_CLIENTS)
    )
    print(f"ladder compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    # warm every bucket twice (first post-compile execution carries
    # one-time staging; __call__'s host-side mse readback synchronizes)
    for n in (1, 8, N_CLIENTS):
        for _ in range(2):
            u = np.stack([r[0] for r in reqs[:n]])
            y = np.stack([r[1] for r in reqs[:n]])
            bp(u, y)

    srv = PredictionServer(
        bp, port=0, max_batch=N_CLIENTS, max_wait_ms=WAIT_MS,
        request_timeout=600,
    )
    srv.start()
    base = f"http://{srv.host}:{srv.port}"
    try:
        # sequential baseline: one HTTP request at a time
        seq_times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            for u, y in reqs:
                _post_predict(base, u, y)
            seq_times.append(time.perf_counter() - t0)
        sequential_s = float(np.median(seq_times))

        # concurrent: all clients in flight, coalesced by the batcher
        # (stats snapshot first: occupancy must cover ONLY this phase —
        # the sequential baseline contributes size-1 batches)
        before = srv.stats()
        conc_times = []
        for _rep in range(REPS):
            barrier = threading.Barrier(N_CLIENTS + 1)
            done = []

            def client(i):
                barrier.wait()
                done.append(_post_predict(base, *reqs[i]))

            threads = [
                threading.Thread(target=client, args=(i,))
                for i in range(N_CLIENTS)
            ]
            for t in threads:
                t.start()
            barrier.wait()
            t0 = time.perf_counter()
            for t in threads:
                t.join()
            conc_times.append(time.perf_counter() - t0)
            assert len(done) == N_CLIENTS
        concurrent_s = float(np.median(conc_times))
        stats = srv.stats()
        d_req = stats["requests"] - before["requests"]
        d_batches = stats["batches"] - before["batches"]
        conc_occupancy = d_req / d_batches if d_batches else 0.0
    finally:
        srv.close()

    out = {
        "n_clients": N_CLIENTS,
        "seq_len": SEQ_LEN,
        "reps": REPS,
        "max_wait_ms": WAIT_MS,
        "format": FORMAT,
        "sequential_s": round(sequential_s, 4),
        "concurrent_s": round(concurrent_s, 4),
        "speedup": round(sequential_s / concurrent_s, 2),
        "sequential_req_per_s": round(N_CLIENTS / sequential_s, 2),
        "concurrent_req_per_s": round(N_CLIENTS / concurrent_s, 2),
        "concurrent_mean_batch_size": round(conc_occupancy, 2),
        "concurrent_dispatches": d_batches,
        "http_errors": stats["http_errors"],
    }
    print(json.dumps(out))
    suffix = "" if FORMAT == "json" else f"_{FORMAT}"
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", f"http_predict_latency{suffix}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
