"""On-chip utilization measurement: FLOPs (XLA cost analysis), measured
steps/sec (host-readback synchronized), and MFU for the benchmark
shapes. Optionally captures a jax.profiler device trace.

Usage (one JAX process at a time against the TPU):

    python scripts/profile_mfu.py robomove [--unroll N] [--steps N]
        [--trace DIR] [--gp-impl pallas]

Output is one JSON line on stdout.

Shapes mirror the reference drivers (run/*.py hyperparameters).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# v5e single-chip peak dense FLOP/s (bf16 MXU). f32 matmuls at HIGHEST
# precision run as multiple bf16 passes, so f32 "speed of light" is a
# fraction of this; MFU is reported against the bf16 peak (the honest
# hardware ceiling).
V5E_PEAK_BF16 = 197e12

SHAPES = {
    # run_robomove.py — the compute-bound reference workload
    "robomove": dict(batch=32, seq_len=300, samples=50, m=100, dim_x=4,
                     dim_u=2, dim_y=2, recog_len=50, lr=0.01),
    # run_sarcos.py — heaviest reference configuration
    "sarcos": dict(batch=5, seq_len=250, samples=20, m=100, dim_x=14,
                   dim_u=7, dim_y=7, recog_len=16, lr=0.05),
    # run_smallscale.py
    "smallscale": dict(batch=10, seq_len=50, samples=50, m=20, dim_x=4,
                       dim_u=1, dim_y=1, recog_len=16, lr=0.1),
}


def build_cbfssm_parts(shape, unroll=1, gp_impl="solve_free",
                       backward_mode="auto", adjoint="auto",
                       gp_matmul_precision=None):
    """Model + params + optimizer + synthetic batch for a benchmark
    shape — THE config both benchmark harnesses (this script and
    decompose_step.py) share, so their numbers stay comparable."""
    import jax
    import optax

    from cbfssm_tpu.models import CBFSSM

    class _DS:
        dim_u = shape["dim_u"]
        dim_y = shape["dim_y"]

    dim_x = shape["dim_x"]
    config = {
        "ds": _DS,
        "batch_size": shape["batch"],
        "shuffle": 10000,
        "dim_x": dim_x,
        "ind_pnt_num": shape["m"],
        "samples": shape["samples"],
        "learning_rate": shape["lr"],
        "loss_factors": np.asarray([20.0, 0.0]),
        "k_factor": 1.0,
        "recog_len": shape["recog_len"],
        "zeta_pos": 2.0,
        "zeta_mean": 0.1**2,
        "zeta_var": 0.01**2,
        "var_x": np.asarray([0.1**2] * dim_x),
        "var_y": np.asarray([1.0**2] * dim_x),
        "gp_var": 0.1**2,
        "gp_len": 1.0,
        "dtype": "float32",
        "scan_unroll": unroll,
        "gp_impl": gp_impl,
        "backward_mode": backward_mode,
        "adjoint": adjoint,
    }
    if gp_matmul_precision is not None:
        # None -> the library default, so the benchmark shapes measure
        # what an out-of-the-box user gets
        config["gp_matmul_precision"] = gp_matmul_precision
    model = CBFSSM(config)
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(shape["lr"])
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    u = rng.normal(size=(shape["batch"], shape["seq_len"], shape["dim_u"])).astype(np.float32)
    y = rng.normal(size=(shape["batch"], shape["seq_len"], shape["dim_y"])).astype(np.float32)
    return model, params, tx, opt_state, u, y


def build_cbfssm_steps(shape, unroll=1, gp_impl="solve_free",
                       backward_mode="auto"):
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    model, params, tx, opt_state, u, y = build_cbfssm_parts(
        shape, unroll=unroll, gp_impl=gp_impl, backward_mode=backward_mode
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def run_steps(params, opt_state, key, n_steps):
        def step(carry, i):
            params, opt_state = carry
            (loss, _), grads = jax.value_and_grad(model.loss, has_aux=True)(
                params, u, y, jax.random.fold_in(key, i), True
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(n_steps)
        )
        return params, opt_state, losses

    return run_steps, params, opt_state


def measure(run_steps, params, opt_state, n_steps, reps=3):
    import jax

    key = jax.random.PRNGKey(1)
    # compile + staging warmup (readback-synced; see BENCHMARKS.md notes)
    t0 = time.perf_counter()
    lowered = run_steps.lower(params, opt_state, key, n_steps)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    for i in range(2):
        params, opt_state, losses = run_steps(
            params, opt_state, jax.random.fold_in(key, i), n_steps
        )
        float(losses[-1])
    rates = []
    for rep in range(reps):
        t0 = time.perf_counter()
        params, opt_state, losses = run_steps(
            params, opt_state, jax.random.fold_in(key, 10 + rep), n_steps
        )
        final = float(losses[-1])
        rates.append(n_steps / (time.perf_counter() - t0))
    assert np.isfinite(final), final
    sps = float(np.median(rates))
    flops_total = float(cost.get("flops", 0.0))
    flops_per_step = flops_total / n_steps
    bytes_total = float(cost.get("bytes accessed", 0.0))
    return {
        "steps_per_sec": round(sps, 2),
        "compile_s": round(compile_s, 1),
        "flops_per_step": flops_per_step,
        "achieved_flops_per_sec": flops_per_step * sps,
        "mfu_vs_bf16_peak": round(flops_per_step * sps / V5E_PEAK_BF16, 5),
        "bytes_per_step": bytes_total / n_steps,
        "achieved_bytes_per_sec": bytes_total / n_steps * sps,
        "rates": [round(r, 2) for r in rates],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shape", choices=sorted(SHAPES) + ["voliro"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--gp-impl", default="solve_free")
    ap.add_argument("--backward-mode", default="auto")
    ap.add_argument("--trace", default=None, help="capture device trace to DIR")
    args = ap.parse_args()

    from cbfssm_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.shape == "voliro":
        import bench

        run_steps, params, opt_state = bench.build_step()
    else:
        run_steps, params, opt_state = build_cbfssm_steps(
            SHAPES[args.shape],
            unroll=args.unroll,
            gp_impl=args.gp_impl,
            backward_mode=args.backward_mode,
        )

    result = measure(run_steps, params, opt_state, args.steps)
    result.update(shape=args.shape, unroll=args.unroll, gp_impl=args.gp_impl,
                  backward_mode=args.backward_mode)

    if args.trace:
        import jax

        from cbfssm_tpu.utils.profiling import trace

        key = jax.random.PRNGKey(99)
        with trace(args.trace):
            p, o, losses = run_steps(params, opt_state, key, args.steps)
            float(losses[-1])
        result["trace_dir"] = args.trace

    print(json.dumps(result))


if __name__ == "__main__":
    main()
