"""Measure FilterPool fleet economics on-chip.

Scenario: a fleet of 32 independent online estimators (CBFSSMHALF,
S=50 particles, M=100 inducing points) ticking in lockstep. Serial
baseline: 32 StreamingFilters, one update dispatch each per tick.
Pool: one batched dispatch per tick. On this rig each dispatch pays
the ~29 ms tunnel roundtrip, so the pool's win measures
dispatches-saved x floor; on-host serving keeps the same structure
with a smaller floor.

Usage: python scripts/bench_filter_pool.py   (ambient env = real TPU)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_STREAMS = 32
TICKS = 20
REPS = 3


def build():
    import jax

    from cbfssm_tpu.models import CBFSSMHALF

    class _DS:
        dim_u = 2
        dim_y = 2

    dim_x = 4
    config = {
        "ds": _DS,
        "batch_size": N_STREAMS,
        "shuffle": 100,
        "dim_x": dim_x,
        "ind_pnt_num": 100,
        "samples": 50,
        "learning_rate": 0.01,
        "loss_factors": np.asarray([1.0, 0.0]),
        "k_factor": 1.0,
        "recog_len": 16,
        "recog_model": "rnn",
        "zeta_pos": 2.0,
        "zeta_mean": 0.1**2,
        "zeta_var": 0.01**2,
        "var_x": np.asarray([0.1**2] * dim_x),
        "var_y": np.asarray([1.0] * _DS.dim_y),
        "gp_var": 0.1**2,
        "gp_len": 1.0,
        "dtype": "float32",
    }
    model = CBFSSMHALF(config)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def main():
    from cbfssm_tpu.serving import FilterPool, StreamingFilter

    model, params = build()
    rng = np.random.default_rng(0)
    recog = int(model.config.recog_len)
    prefixes = [
        (
            rng.normal(size=(recog, model.dim_u)).astype(np.float32),
            rng.normal(size=(recog, model.dim_y)).astype(np.float32),
        )
        for _ in range(N_STREAMS)
    ]
    ticks = [
        [
            (
                rng.normal(size=model.dim_u).astype(np.float32),
                rng.normal(size=model.dim_y).astype(np.float32),
            )
            for _ in range(N_STREAMS)
        ]
        for _ in range(TICKS)
    ]

    # serial baseline: one StreamingFilter per stream
    t0 = time.perf_counter()
    filters = [StreamingFilter(model, params, batch=1, seed=0)]
    print(
        f"single-stream compile: {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )
    filters += [StreamingFilter(model, params, batch=1, seed=0)
                for _ in range(N_STREAMS - 1)]
    for f, (u, y) in zip(filters, prefixes):
        f.start(u[None], y[None])
    # warmup ticks (absorb one-time program staging), then timed reps
    for f, (u, y) in zip(filters, ticks[0]):
        float(f.update(u[None], y[None])[0][0, 0])
    serial = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        for tick in ticks[1:]:
            for f, (u, y) in zip(filters, tick):
                mean, _ = f.update(u[None], y[None])
            float(mean[0, 0])  # host sync once per tick (last stream)
        serial.append((time.perf_counter() - t0) / (TICKS - 1))
    serial_ms = 1e3 * float(np.median(serial))

    # pooled: one dispatch per tick
    t0 = time.perf_counter()
    pool = FilterPool(model, params, capacity=N_STREAMS, seed=0)
    print(f"pool compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    sids = [pool.attach(u, y) for u, y in prefixes]
    pool.step({s: uy for s, uy in zip(sids, ticks[0])})  # warmup
    pooled = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        for tick in ticks[1:]:
            out = pool.step({s: uy for s, uy in zip(sids, tick)})
        float(out[sids[-1]][0][0])  # step() already fans out on host
        pooled.append((time.perf_counter() - t0) / (TICKS - 1))
    pooled_ms = 1e3 * float(np.median(pooled))

    print(
        json.dumps(
            {
                "shape": "cbfssmhalf_fleet",
                "n_streams": N_STREAMS,
                "serial_ms_per_tick": round(serial_ms, 1),
                "pooled_ms_per_tick": round(pooled_ms, 2),
                "speedup": round(serial_ms / pooled_ms, 1),
                "pooled_ms_per_stream_tick": round(pooled_ms / N_STREAMS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
