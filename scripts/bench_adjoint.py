"""Ablate the hand-adjoint rollouts pass-by-pass on a benchmark shape.

Measures value_and_grad time for the four (forward, backward) adjoint
combinations by flipping the model's `_hand_adjoint` flag at trace time
around each pass. Methodology matches scripts/decompose_step.py
(scanned steps per dispatch, readback-synchronized, warmup).

Usage: python scripts/bench_adjoint.py robomove [--steps 10]
"""

import argparse
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cbfssm_tpu.utils.xla_cache import enable_persistent_cache
    from scripts.profile_mfu import build_cbfssm_parts

    enable_persistent_cache()
    shape = SHAPES[args.shape]
    model, params, tx, opt_state, u, y = build_cbfssm_parts(
        shape, adjoint="hand"
    )
    n_steps = args.steps

    # Wrap the two passes so each reads its own hand/autodiff flag.
    orig_backward = model._backward
    orig_forward = model._forward
    flags = {"fwd": True, "bwd": True}

    def backward(*a, **k):
        model._hand_adjoint = flags["bwd"]
        try:
            return orig_backward(*a, **k)
        finally:
            model._hand_adjoint = True

    def forward(*a, **k):
        model._hand_adjoint = flags["fwd"]
        try:
            return orig_forward(*a, **k)
        finally:
            model._hand_adjoint = True

    model._backward = backward
    model._forward = forward

    def make_grad_fn():
        @jax.jit
        def run(params, key):
            def step(acc, i):
                (loss, _), grads = jax.value_and_grad(model.loss, has_aux=True)(
                    params, u, y, jax.random.fold_in(key, i), True
                )
                return acc + loss + jax.tree_util.tree_reduce(
                    lambda a, g: a + jnp.sum(jnp.abs(g)), grads,
                    jnp.asarray(0.0, model.dtype),
                ), None

            acc, _ = jax.lax.scan(
                step, jnp.asarray(0.0, model.dtype), jnp.arange(n_steps)
            )
            return acc

        return run

    results = {}
    key = jax.random.PRNGKey(5)
    for fwd_hand in (False, True):
        for bwd_hand in (False, True):
            flags["fwd"], flags["bwd"] = fwd_hand, bwd_hand
            fn = make_grad_fn()
            for w in range(2):
                float(fn(params, jax.random.fold_in(key, w)))
            ts = []
            for rep in range(3):
                t0 = time.perf_counter()
                float(fn(params, jax.random.fold_in(key, 10 + rep)))
                ts.append((time.perf_counter() - t0) / n_steps)
            name = f"fwd={'hand' if fwd_hand else 'auto'}/bwd={'hand' if bwd_hand else 'auto'}"
            results[name] = round(float(np.median(ts)) * 1e3, 2)
            print(name, results[name], flush=True)

    results.update(shape=args.shape, unit="ms/step (value_and_grad)")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
