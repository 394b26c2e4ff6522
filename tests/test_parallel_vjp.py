"""Log-depth scan reverse (ops/parallel_vjp.py) vs reverse-mode autodiff.

A toy nonlinear per-row recursion with loop constants, per-step inputs,
and an extra (row-coupling) output exercises every cotangent path: the
associative-scan chain, the deferred constant accumulation, per-step
input cotangents, and the initial-carry cotangent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cbfssm_tpu.ops.parallel_vjp import scan_outputs_vjp


def toy_step(consts, c, inp):
    """c: [R, D] rowwise carry; consts: (w [D, D], bias [D]);
    inp: (u [R, D], eps [R, 1])."""
    w, bias = consts
    u, eps = inp
    h = jnp.tanh(c @ w + bias) + 0.3 * c
    c_next = h + eps * jnp.sqrt(1.0 + jnp.square(u))
    extra = jnp.sum(jnp.log(1.0 + jnp.square(c_next)), axis=-1)  # [R]
    return c_next, (c_next, extra)


def build(rng, t_len=13, r=5, d=3):
    w = jnp.asarray(0.3 * rng.normal(size=(d, d)))
    bias = jnp.asarray(0.1 * rng.normal(size=(d,)))
    c0 = jnp.asarray(rng.normal(size=(r, d)))
    u = jnp.asarray(rng.normal(size=(t_len, r, d)))
    eps = jnp.asarray(rng.normal(size=(t_len, r, 1)))
    return (w, bias), c0, (u, eps)


def loss_from_outs(outs):
    carries, extra = outs
    return jnp.sum(jnp.sin(carries)) + 2.0 * jnp.sum(extra)


def test_primal_matches_plain_scan(rng):
    consts, c0, inputs = build(rng)
    outs = scan_outputs_vjp(toy_step, consts, c0, inputs)
    _, want = jax.lax.scan(
        lambda c, i: toy_step(consts, c, i), c0, inputs
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        outs,
        want,
    )


@pytest.mark.parametrize("t_len", [1, 2, 7, 16])
def test_grads_match_autodiff(rng, t_len):
    consts, c0, inputs = build(rng, t_len=t_len)

    def f_par(consts, c0, inputs):
        return loss_from_outs(scan_outputs_vjp(toy_step, consts, c0, inputs))

    def f_auto(consts, c0, inputs):
        _, outs = jax.lax.scan(
            lambda c, i: toy_step(consts, c, i), c0, inputs
        )
        return loss_from_outs(outs)

    g_par = jax.grad(f_par, argnums=(0, 1, 2))(consts, c0, inputs)
    g_auto = jax.grad(f_auto, argnums=(0, 1, 2))(consts, c0, inputs)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-12
        ),
        g_par,
        g_auto,
    )


def test_grads_match_under_jit_and_vmap(rng):
    consts, c0, inputs = build(rng, t_len=9)

    def f(consts, c0, inputs):
        return loss_from_outs(scan_outputs_vjp(toy_step, consts, c0, inputs))

    g1 = jax.jit(jax.grad(f))(consts, c0, inputs)
    g2 = jax.grad(f)(consts, c0, inputs)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9
        ),
        g1,
        g2,
    )

    # vmapped over a leading lane axis (multiseed-style)
    c0s = jnp.stack((c0, c0 + 0.1))
    gv = jax.vmap(lambda c: jax.grad(f, argnums=1)(consts, c, inputs))(c0s)
    g_lane0 = jax.grad(f, argnums=1)(consts, c0, inputs)
    np.testing.assert_allclose(
        np.asarray(gv[0]), np.asarray(g_lane0), rtol=1e-9
    )
