"""Step-time decomposition for a CBFSSM training step.

On-chip traces are unavailable on this rig (the tunneled TPU rejects
device profiling; jax.profiler captures a host-only plane and the traced
run fails with INVALID_ARGUMENT — see BENCHMARKS.md). This script gets
the same answer by timing jitted SUB-programs of the training step,
readback-synchronized, each scanned ``--steps`` times per dispatch so
tunnel overhead amortizes identically to production:

  precompute   GP Gram Cholesky/inverse (per optimizer step, loop-invariant)
  backward     recognition pass only (primal)
  forward      generative/conditioning pass only (primal, fixed y_tilde)
  loss         full primal ELBO
  grad         value_and_grad of the ELBO (the production step sans Adam)
  train        full optimizer step (the production step)

Usage: python scripts/decompose_step.py robomove [--steps 10]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from scripts.profile_mfu import SHAPES  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shape", choices=sorted(SHAPES))
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--backward-mode", default="auto")
    ap.add_argument("--gp-impl", default="solve_free")
    ap.add_argument("--adjoint", default="auto")
    ap.add_argument("--precision", default="highest")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cbfssm_tpu.ops import gp, transforms
    from cbfssm_tpu.utils.xla_cache import enable_persistent_cache
    from scripts.profile_mfu import build_cbfssm_parts

    enable_persistent_cache()
    shape = SHAPES[args.shape]
    dim_x = shape["dim_x"]
    # the SAME config/model/data as the MFU harness — but NOTE: this
    # CLI defaults --precision to 'highest' (kept so r3's recorded
    # decompositions stay reproducible) while the library default is
    # now 'high' (r4 flip); pass --precision high before subtracting
    # these pieces from profile_mfu/bench.py totals
    model, params, tx, opt_state, u, y = build_cbfssm_parts(
        shape, unroll=args.unroll, gp_impl=args.gp_impl,
        backward_mode=args.backward_mode, adjoint=args.adjoint,
        gp_matmul_precision=args.precision,
    )
    b, t = shape["batch"], shape["seq_len"]
    n_steps = args.steps

    def scanned(body):
        """Run `body(key_i)` n_steps times in one device program; return
        a scalar so timing includes a host readback."""

        @jax.jit
        def run(params, key):
            def step(acc, i):
                return acc + body(params, jax.random.fold_in(key, i)), None

            acc, _ = jax.lax.scan(
                step, jnp.asarray(0.0, model.dtype), jnp.arange(n_steps)
            )
            return acc

        return run

    def piece_floor(params, key):
        # harness floor: the scanned-dispatch + readback cost every piece
        # below includes (dominated by the tunnel roundtrip / n_steps);
        # subtract it to get device-compute time per piece
        return jnp.sum(params.var_x_unc) + key[0] * 0.0

    def piece_precompute(params, key):
        cf = gp.precompute(params.gp_f, model.jitter)
        cb = gp.precompute(params.gp_b, model.jitter)
        return jnp.sum(cf.kinv) + jnp.sum(cb.kinv) + jnp.sum(cf.alpha) * 0 + key[0] * 0

    def piece_backward(params, key):
        var_x = transforms.positive(params.var_x_unc)
        cache_b = gp.precompute(params.gp_b, model.jitter)
        u_tm, y_tm = model._time_major(u), model._time_major(y)
        y_tilde, entropy = model._backward(cache_b, var_x, u_tm, y_tm, key)
        return jnp.sum(y_tilde) + jnp.sum(entropy)

    def piece_forward(params, key):
        var_x = transforms.positive(params.var_x_unc)
        var_y = transforms.positive(params.var_y_unc)
        cache_f = gp.precompute(params.gp_f, model.jitter)
        u_tm = model._time_major(u)
        # fixed pseudo-observations: isolates the forward recursion
        y_tilde = jnp.zeros(
            (t, b, shape["samples"], dim_x), dtype=model.dtype
        ) + 0.01 * jax.random.normal(key, (1, b, 1, 1), dtype=model.dtype)
        x_final, kl_x = model._forward(
            cache_f, var_x, var_y, y_tilde, u_tm, key, True
        )
        return jnp.sum(x_final) + jnp.sum(kl_x)

    def piece_loss(params, key):
        loss, _ = model.loss(params, u, y, key, True)
        return loss

    def piece_grad(params, key):
        (loss, _), grads = jax.value_and_grad(model.loss, has_aux=True)(
            params, u, y, key, True
        )
        return loss + jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.abs(g)), grads, jnp.asarray(0.0, model.dtype)
        )

    pieces = {
        "floor": scanned(piece_floor),
        "precompute": scanned(piece_precompute),
        "backward": scanned(piece_backward),
        "forward": scanned(piece_forward),
        "loss": scanned(piece_loss),
        "grad": scanned(piece_grad),
    }

    # full training step (production shape)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_steps(params, opt_state, key):
        def step(carry, i):
            p, o = carry
            (loss, _), grads = jax.value_and_grad(model.loss, has_aux=True)(
                p, u, y, jax.random.fold_in(key, i), True
            )
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), loss

        (p, o), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(n_steps)
        )
        return p, o, losses

    results = {}
    key = jax.random.PRNGKey(5)
    for name, fn in pieces.items():
        for w in range(2):  # compile + staging warmup
            float(fn(params, jax.random.fold_in(key, w)))
        ts = []
        for rep in range(3):
            t0 = time.perf_counter()
            float(fn(params, jax.random.fold_in(key, 10 + rep)))
            ts.append((time.perf_counter() - t0) / n_steps)
        results[name] = round(float(np.median(ts)) * 1e3, 2)  # ms/step

    p2, o2 = params, opt_state
    for w in range(2):
        p2, o2, losses = train_steps(p2, o2, jax.random.fold_in(key, 20 + w))
        float(losses[-1])
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        p2, o2, losses = train_steps(p2, o2, jax.random.fold_in(key, 30 + rep))
        float(losses[-1])
        ts.append((time.perf_counter() - t0) / n_steps)
    results["train"] = round(float(np.median(ts)) * 1e3, 2)

    results.update(
        shape=args.shape, unroll=args.unroll,
        backward_mode=args.backward_mode, gp_impl=args.gp_impl,
        adjoint=args.adjoint, precision=args.precision, unit="ms/step",
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
