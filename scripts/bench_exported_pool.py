"""Exported fleet pool on the real chip: artifact vs in-framework.

Scenario: the deployment claim of cbfssm_tpu/export_pool.py measured
end to end — a CPU-side export (platforms cpu+tpu) served on the TPU
must match the in-framework FilterPool bitwise and tick at the same
rate. Drives a 32-session fleet through identical tick streams on both
pools (states stay lockstep, so outputs are directly comparable) plus
one fused 16-step replay.

Timing notes (CLAUDE.md): host-value readbacks synchronize every tick
(the pools' host fan-out does one per tick), and the first post-compile
tick is excluded (one-time program staging).

Usage: python scripts/bench_exported_pool.py   (ambient env = real TPU)
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CAPACITY = int(os.environ.get("CBFSSM_POOL_BENCH_CAPACITY", 32))
TICKS = int(os.environ.get("CBFSSM_POOL_BENCH_TICKS", 30))


def build():
    import jax

    from cbfssm_tpu.models import CBFSSMHALF
    from tests.test_other_models import half_config

    cfg = half_config("rnn")
    cfg["dtype"] = "float32"  # the TPU serving dtype
    model = CBFSSMHALF(cfg)
    return model, model.init(jax.random.PRNGKey(0))


def main():
    from cbfssm_tpu.export_pool import ExportedFilterPool, save_exported_pool
    from cbfssm_tpu.serving import FilterPool

    model, params = build()
    rng = np.random.default_rng(0)
    du, dy = model.dim_u, model.dim_y
    recog = int(model.config.recog_len)

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "pool")
        save_exported_pool(path, model, params, capacity=CAPACITY,
                           replay_buckets=(16,), seed=0)
        pool = FilterPool(model, params, capacity=CAPACITY, seed=0,
                          replay_buckets=(16,))
        epool = ExportedFilterPool(path)

        prefs = [(rng.normal(size=(recog, du)), rng.normal(size=(recog, dy)))
                 for _ in range(CAPACITY)]
        sids = [pool.attach(*p) for p in prefs]
        assert sids == [epool.attach(*p) for p in prefs]

        def tick():
            return {s: (rng.normal(size=(du,)), rng.normal(size=(dy,)))
                    for s in sids}

        # warmup: compile + one-time staging; also the first equality
        def pair_err(a, b):
            # BOTH output channels: a var-only divergence must not
            # hide behind a clean mean
            return max(float(np.max(np.abs(a[s][c] - b[s][c])))
                       for s in sids for c in (0, 1))

        first = tick()
        o1, o2 = pool.step(first), epool.step(first)
        rel = pair_err(o1, o2)

        ticks = [tick() for _ in range(TICKS)]
        t0 = time.perf_counter()
        outs_f = [pool.step(t) for t in ticks]
        tf = (time.perf_counter() - t0) / TICKS
        t0 = time.perf_counter()
        outs_a = [epool.step(t) for t in ticks]  # SAME ticks: lockstep
        ta = (time.perf_counter() - t0) / TICKS
        rel = max(rel, max(pair_err(a, b)
                           for a, b in zip(outs_f, outs_a)))

        blk = {sids[0]: (rng.normal(size=(16, du)),
                         rng.normal(size=(16, dy)))}
        r1, r2 = pool.replay(blk), epool.replay(blk)
        rel_rp = max(float(np.max(np.abs(r1[sids[0]][c] - r2[sids[0]][c])))
                     for c in (0, 1))

    out = {
        "shape": f"cbfssmhalf_fleet{CAPACITY}_S{model.samples}"
                 f"_dx{model.dim_x}_f32",
        "capacity": CAPACITY,
        "ticks": TICKS,
        "framework_ms_per_fleet_tick": round(1e3 * tf, 1),
        "exported_ms_per_fleet_tick": round(1e3 * ta, 1),
        "step_max_abs_err": rel,
        "replay_max_abs_err": rel_rp,
        "script": "scripts/bench_exported_pool.py",
    }
    print(json.dumps(out))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "exported_pool_latency.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
