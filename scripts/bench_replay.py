"""Backlog catch-up latency: fused replay vs sequential updates.

The failover path for a deployed online estimator: a replica restores
a state snapshot and must replay the (control, observation) backlog
accumulated since. Sequentially that pays one device dispatch per step
— on this rig ~29 ms tunnel roundtrip floor per update (BENCHMARKS.md
"Dispatch floor"), so a 64-step backlog costs ~2 s of pure floor.
`StreamingFilter.replay` / `ExportedFilter.replay` scan the whole
block in one dispatch per bucket chunk, so the catch-up cost collapses
to ~one floor + the (tiny) device compute.

Scenario: one online stream (the serving config of
scripts/bench_filter_pool.py: S=50, M=100, f32), backlog of K steps,
median of REPS reps, host-synced. Sequential is measured at a smaller
K and scaled per-step (it is floor-dominated and linear); fused is
measured at full K. Also measures the exported-artifact replay and
checks fused-vs-sequential agreement at the final state.

Usage: python scripts/bench_replay.py  (ambient env = real TPU)
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.bench_filter_pool import build

K = 64
K_SEQ = 16  # sequential sample (floor-dominated, scales linearly)
REPS = 5


def main():
    from cbfssm_tpu.export import ExportedFilter, save_exported_filter
    from cbfssm_tpu.serving import StreamingFilter

    model, params = build()
    rng = np.random.default_rng(0)
    recog = int(model.config.recog_len)
    u_p = rng.normal(size=(1, recog, model.dim_u)).astype(np.float32)
    y_p = rng.normal(size=(1, recog, model.dim_y)).astype(np.float32)
    u_blk = rng.normal(size=(1, K, model.dim_u)).astype(np.float32)
    y_blk = rng.normal(size=(1, K, model.dim_y)).astype(np.float32)

    # --- sequential baseline (the pre-replay failover cost) -----------
    seq = StreamingFilter(model, params, batch=1, seed=0)
    seq.start(u_p, y_p)
    snap = seq.state  # the restored snapshot every variant replays from
    seq.update(u_blk[:, 0], y_blk[:, 0])  # warmup staging
    reps = []
    for _ in range(REPS):
        seq.load_state(snap)
        t0 = time.perf_counter()
        for t in range(K_SEQ):
            m, _ = seq.update(u_blk[:, t], y_blk[:, t])
        float(np.asarray(m)[0, 0])
        reps.append((time.perf_counter() - t0) / K_SEQ)
    seq_ms_per_step = 1e3 * float(np.median(reps))

    # --- fused replay (in-framework) ----------------------------------
    # time ONLY the replay-program lowering+compile (the constructor
    # also AOT-compiles start/update, a cost every variant pays)
    fused = StreamingFilter(model, params, batch=1, seed=0)
    t0 = time.perf_counter()
    fused._replay_compiled(K)  # same cache entry replay(K) will use
    fused_compile_s = time.perf_counter() - t0
    fused.load_state(snap)
    fused.replay(u_blk, y_blk)  # warmup staging
    reps = []
    for _ in range(REPS):
        fused.load_state(snap)
        t0 = time.perf_counter()
        m, _ = fused.replay(u_blk, y_blk)
        float(np.asarray(m)[0, -1, 0])
        reps.append(time.perf_counter() - t0)
    fused_ms = 1e3 * float(np.median(reps))

    # agreement with the sequential trajectory at the final state
    seq.load_state(snap)
    for t in range(K):
        m_s, _ = seq.update(u_blk[:, t], y_blk[:, t])
    rel = float(np.max(np.abs(np.asarray(m)[:, -1] - np.asarray(m_s))
                       / (np.abs(np.asarray(m_s)) + 1e-6)))

    # --- fused replay (exported artifact) ------------------------------
    with tempfile.TemporaryDirectory() as d:
        art = os.path.join(d, "filter")
        save_exported_filter(art, model, params, batch=1, seed=0,
                             replay_buckets=(K,))
        exported = ExportedFilter(art)
        exported.load_state(snap)
        exported.replay(u_blk, y_blk)  # warmup (compile at first call)
        reps = []
        for _ in range(REPS):
            exported.load_state(snap)
            t0 = time.perf_counter()
            m_e, _ = exported.replay(u_blk, y_blk)
            float(np.asarray(m_e)[0, -1, 0])
            reps.append(time.perf_counter() - t0)
        exported_ms = 1e3 * float(np.median(reps))

    # --- whole-fleet catch-up (FilterPool, ragged backlogs) ------------
    from cbfssm_tpu.serving import FilterPool

    cap = 32
    lens = (rng.integers(1, K + 1, size=cap)).tolist()  # ragged
    prefixes = [
        (rng.normal(size=(recog, model.dim_u)).astype(np.float32),
         rng.normal(size=(recog, model.dim_y)).astype(np.float32))
        for _ in range(cap)
    ]
    backlogs = [
        (rng.normal(size=(k, model.dim_u)).astype(np.float32),
         rng.normal(size=(k, model.dim_y)).astype(np.float32))
        for k in lens
    ]

    def fresh_pool():
        pool = FilterPool(model, params, capacity=cap, seed=0)
        sids = [pool.attach(u, y) for u, y in prefixes]
        return pool, sids

    # sequential schedule: tick t carries the sessions with K_i > t
    pool_s, sids_s = fresh_pool()
    pool_s.step({sids_s[0]: (backlogs[0][0][0], backlogs[0][1][0])})  # warmup
    p_state = pool_s.state
    pool_s.load_state(p_state)
    t0 = time.perf_counter()
    for t in range(max(lens)):
        ins = {
            sids_s[i]: (backlogs[i][0][t], backlogs[i][1][t])
            for i in range(cap) if t < lens[i]
        }
        out = pool_s.step(ins)
    pool_seq_ms = 1e3 * (time.perf_counter() - t0)

    pool_f, sids_f = fresh_pool()
    pool_f.load_state(p_state)
    ins_all = {sids_f[i]: backlogs[i] for i in range(cap)}
    pool_f.replay(ins_all)  # warmup staging + compile
    pool_f.load_state(p_state)
    t0 = time.perf_counter()
    res = pool_f.replay(ins_all)
    pool_fused_ms = 1e3 * (time.perf_counter() - t0)
    # agreement at the last tick of the longest session
    i_max = int(np.argmax(lens))
    pool_rel = float(np.max(np.abs(
        res[sids_f[i_max]][0][-1] - out[sids_s[i_max]][0]
    ) / (np.abs(out[sids_s[i_max]][0]) + 1e-6)))

    print(json.dumps({
        "shape": "cbfssmhalf_stream_S50_M100_f32",
        "backlog_steps": K,
        "sequential_ms_per_step": round(seq_ms_per_step, 2),
        "sequential_ms_backlog_est": round(seq_ms_per_step * K, 1),
        "fused_ms_backlog": round(fused_ms, 1),
        "exported_fused_ms_backlog": round(exported_ms, 1),
        "speedup_vs_sequential": round(seq_ms_per_step * K / fused_ms, 1),
        "fused_compile_s": round(fused_compile_s, 2),
        "final_step_rel_err": rel,
        "pool_streams": cap,
        "pool_backlog_max": int(max(lens)),
        "pool_sequential_ms": round(pool_seq_ms, 1),
        "pool_fused_ms": round(pool_fused_ms, 1),
        "pool_speedup": round(pool_seq_ms / pool_fused_ms, 1),
        "pool_final_rel_err": pool_rel,
    }))


if __name__ == "__main__":
    main()
