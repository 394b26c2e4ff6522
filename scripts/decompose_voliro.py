"""Step-time decomposition for the Voliro headline config (bench.py).

Same methodology as decompose_step.py (scanned sub-programs,
readback-synchronized): isolates the batched force-GP, the two
sequential scans (primal), the full primal ELBO, and value_and_grad —
the numbers behind any attempt on the headline's reverse pass.

Usage: python scripts/decompose_voliro.py [--steps 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--adjoint", default="auto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cbfssm_tpu.ops import gp, transforms
    from cbfssm_tpu.utils.xla_cache import enable_persistent_cache
    import bench

    enable_persistent_cache()

    # the exact bench.py model/data (shared builder — numbers comparable)
    model, params, u, y = bench.build_voliro_parts(adjoint=args.adjoint)
    n_steps = args.steps

    def scanned(body):
        @jax.jit
        def run(params, key):
            def step(acc, i):
                return acc + body(params, jax.random.fold_in(key, i)), None

            acc, _ = jax.lax.scan(
                step, jnp.asarray(0.0, model.dtype), jnp.arange(n_steps)
            )
            return acc

        return run

    def setup(params, key):
        var_x = transforms.positive(params.var_x_unc)
        var_y = transforms.positive(params.var_y_unc)
        var_z = transforms.positive(params.var_z_unc)
        cache_f = gp.precompute(params.gp_f, model.jitter)
        cache_b = gp.precompute(params.gp_b, model.jitter)
        u_bt = jnp.asarray(u, model.dtype)
        kz, kb, kf = jax.random.split(key, 3)
        ft_gp, *_ = model.gp_forces(cache_f, var_z, u_bt, kz)
        return var_x, var_y, cache_b, ft_gp, kb, kf

    def piece_forces(params, key):
        var_x, var_y, cache_b, ft_gp, kb, kf = setup(params, key)
        return jnp.sum(ft_gp)

    def piece_backward(params, key):
        var_x, var_y, cache_b, ft_gp, kb, kf = setup(params, key)
        ft_tm = jnp.transpose(ft_gp, (1, 0, 2, 3))
        yh_tm = model._time_major(model.out_to_hidden(jnp.asarray(y, model.dtype)))
        y_tilde, entropy = model._backward(cache_b, ft_tm, yh_tm, kb)
        return jnp.sum(y_tilde) + jnp.sum(entropy)

    def piece_primal(params, key):
        loss, _ = model.loss(params, u, y, key, True)
        return loss

    def piece_grad(params, key):
        (loss, _), grads = jax.value_and_grad(model.loss, has_aux=True)(
            params, u, y, key, True
        )
        return loss + jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.abs(g)), grads,
            jnp.asarray(0.0, model.dtype),
        )

    def piece_floor(params, key):
        # harness floor: scanned fold_in + a param touch, no model work
        return jnp.sum(params.var_x_unc) + key[0] * 0.0

    def piece_precompute(params, key):
        cache_f = gp.precompute(params.gp_f, model.jitter)
        cache_b = gp.precompute(params.gp_b, model.jitter)
        return jnp.sum(cache_f.kinv) + jnp.sum(cache_b.kinv) + key[0] * 0.0

    def piece_precompute_pair(params, key):
        cache_f, cache_b = gp.precompute_pair(params.gp_f, params.gp_b, model.jitter)
        return jnp.sum(cache_f.kinv) + jnp.sum(cache_b.kinv) + key[0] * 0.0

    pieces = {
        "floor": scanned(piece_floor),
        "precompute": scanned(piece_precompute),
        "precompute_pair": scanned(piece_precompute_pair),
        "forces_gp": scanned(piece_forces),
        "backward_scan": scanned(piece_backward),
        "primal_loss": scanned(piece_primal),
        "grad": scanned(piece_grad),
    }
    results = {}
    key = jax.random.PRNGKey(5)
    for name, fn in pieces.items():
        for w in range(2):
            float(fn(params, jax.random.fold_in(key, w)))
        rates = []
        for rep in range(3):
            t0 = time.perf_counter()
            float(fn(params, jax.random.fold_in(key, 10 + rep)))
            rates.append((time.perf_counter() - t0) / n_steps)
        results[name] = round(float(np.median(rates)) * 1e3, 3)
    results.update(unit="ms/step", batch=bench.BATCH, seq_len=bench.SEQ_LEN,
                   samples=bench.SAMPLES, adjoint=args.adjoint)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
