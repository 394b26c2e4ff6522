"""Per-update serving latency: ExportedFilter vs StreamingFilter.

The exported online estimator (cbfssm_tpu.export.save_exported_filter)
must serve the per-step hot path at parity with the in-framework
StreamingFilter — the artifact exists to drop the framework dependency,
not to add latency. Params/ops are device_put once at load (a numpy
leaf would re-upload the parameter set + the cached GP factorization
through the tunnel on EVERY update).

Scenario: one online stream (same CBFSSMHALF serving config as
scripts/bench_filter_pool.py: S=50, M=100, f32), per-update latency
with a host readback every step (the online serving semantic), medians
over UPDATES steps x REPS reps. On this rig each update pays the
~29 ms tunnel roundtrip floor; on-host serving keeps the structure
with a smaller floor.

Usage: python scripts/bench_exported_filter.py  (ambient env = real TPU)
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.bench_filter_pool import build

UPDATES = 20
REPS = 3


def timed_updates(filt, steps):
    reps = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for u, y in steps:
            mean, _ = filt.update(u[None], y[None])
            float(np.asarray(mean)[0, 0])  # host sync every update
        reps.append((time.perf_counter() - t0) / len(steps))
    return 1e3 * float(np.median(reps))


def main():
    from cbfssm_tpu.export import ExportedFilter, save_exported_filter
    from cbfssm_tpu.serving import StreamingFilter

    model, params = build()
    rng = np.random.default_rng(0)
    recog = int(model.config.recog_len)
    u_p = rng.normal(size=(1, recog, model.dim_u)).astype(np.float32)
    y_p = rng.normal(size=(1, recog, model.dim_y)).astype(np.float32)
    steps = [
        (rng.normal(size=model.dim_u).astype(np.float32),
         rng.normal(size=model.dim_y).astype(np.float32))
        for _ in range(UPDATES)
    ]

    with tempfile.TemporaryDirectory() as d:
        art = os.path.join(d, "filter")
        t0 = time.perf_counter()
        save_exported_filter(art, model, params, batch=1, seed=0)
        export_s = time.perf_counter() - t0
        print(f"export (trace+lower): {export_s:.1f}s", file=sys.stderr)

        t0 = time.perf_counter()
        exported = ExportedFilter(art)
        load_s = time.perf_counter() - t0
        exported.start(u_p, y_p)
        # warmup: first post-compile execution carries one-time staging
        exported.update(steps[0][0][None], steps[0][1][None])
        exported_ms = timed_updates(exported, steps[1:])

        t0 = time.perf_counter()
        ref = StreamingFilter(model, params, batch=1, seed=0)
        compile_s = time.perf_counter() - t0
        ref.start(u_p, y_p)
        ref.update(steps[0][0][None], steps[0][1][None])
        ref_ms = timed_updates(ref, steps[1:])

        # lockstep equality at the measured state (same seed-0 key
        # stream; fold semantics pinned by tests/test_export.py)
        m_e, v_e = exported.update(steps[0][0][None], steps[0][1][None])
        m_r, v_r = ref.update(steps[0][0][None], steps[0][1][None])
        rel = float(np.max(np.abs(np.asarray(m_e) - np.asarray(m_r))
                           / (np.abs(np.asarray(m_r)) + 1e-6)))

    print(json.dumps({
        "shape": "cbfssmhalf_stream_S50_M100_f32",
        "exported_ms_per_update": round(exported_ms, 1),
        "framework_ms_per_update": round(ref_ms, 1),
        "exported_load_s": round(load_s, 2),
        "framework_compile_s": round(compile_s, 2),
        "export_s": round(export_s, 2),
        "lockstep_rel_err": rel,
    }))


if __name__ == "__main__":
    main()
