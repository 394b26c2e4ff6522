"""Measure MicroBatcher coalescing economics on-chip.

Scenario: 32 concurrent single-sequence clients (RoboMove serving
shape, 300 steps, S=50, M=100). Serial baseline dispatches each
request alone (bucket 1); MicroBatcher coalesces them through the
(1, 8, 32) ladder. On this rig every dispatch pays the ~29 ms tunnel
roundtrip, so coalescing's win is a direct measurement of
dispatches-saved x floor — on-host serving keeps the (smaller) fixed
dispatch overhead and the same batching-is-nearly-free scan widening.

Usage: python scripts/bench_microbatch.py   (ambient env = real TPU)
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cbfssm_tpu.serving import BucketedPredictor, MicroBatcher
from scripts.profile_mfu import SHAPES, build_cbfssm_parts

N_CLIENTS = 32
SEQ_LEN = 300
REPS = 5


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
    bp = BucketedPredictor(model, params, seq_len=SEQ_LEN, buckets=(1, 8, 32))
    print(f"ladder compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # warm every bucket twice (first post-compile execution carries
    # one-time staging; __call__'s host-side mse readback synchronizes)
    for n in (1, 8, 32):
        for _ in range(2):
            u = np.stack([r[0] for r in reqs[:n]])
            y = np.stack([r[1] for r in reqs[:n]])
            bp(u, y)

    # serial baseline: one dispatch per request
    serial = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for u, y in reqs:
            bp(u[None], y[None])
        serial.append(time.perf_counter() - t0)
    serial_s = float(np.median(serial))

    # coalesced: 32 concurrent clients through the microbatcher
    coalesced, occupancies = [], []
    for rep in range(REPS):
        mb = MicroBatcher(bp, max_batch=32, max_wait_ms=20.0, seed=rep)
        barrier = threading.Barrier(N_CLIENTS + 1)
        done = []

        def client(i):
            barrier.wait()
            done.append(mb(*reqs[i], timeout=300))

        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(N_CLIENTS)
        ]
        for t in threads:
            t.start()
        barrier.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        coalesced.append(time.perf_counter() - t0)
        s = mb.stats()
        occupancies.append(s["mean_batch_size"])
        mb.close()
        assert len(done) == N_CLIENTS and s["errors"] == 0

    co_s = float(np.median(coalesced))
    print(
        json.dumps(
            {
                "shape": "robomove_serving",
                "n_requests": N_CLIENTS,
                "serial_total_s": round(serial_s, 4),
                "coalesced_total_s": round(co_s, 4),
                "speedup": round(serial_s / co_s, 2),
                "mean_batch_occupancy": round(float(np.median(occupancies)), 1),
                "serial_ms_per_req": round(1e3 * serial_s / N_CLIENTS, 1),
                "coalesced_ms_per_req": round(1e3 * co_s / N_CLIENTS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
