"""Fused GP predict: values and analytic VJP vs the jnp ground truth.

On the CPU test backend the fused path executes its jnp fallback, so
these tests validate the custom-VJP math; the pallas kernel itself is
additionally validated in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cbfssm_tpu.ops import gp
from cbfssm_tpu.ops.pallas import gp_predict


def make_inputs(rng, n=37, m=11, di=5, d=3, dtype=jnp.float64):
    x = jnp.asarray(rng.normal(size=(n, di)), dtype=dtype)
    z = jnp.asarray(rng.normal(size=(m, di)), dtype=dtype)
    ls = jnp.asarray(rng.uniform(0.5, 2.0, size=di), dtype=dtype)
    inv_ls = 1.0 / ls
    zs = z * inv_ls
    kvar = jnp.asarray(0.7, dtype=dtype)
    a = rng.normal(size=(m, m))
    kinv = jnp.asarray(np.linalg.inv(a @ a.T + m * np.eye(m)), dtype=dtype)
    alpha = jnp.asarray(rng.normal(size=(m, d)), dtype=dtype)
    var_q = jnp.asarray(rng.uniform(0.01, 0.5, size=(m, d)), dtype=dtype)
    return x, zs, inv_ls, kvar, kinv, alpha, var_q


def test_forward_matches_gp_predict(rng):
    """fused_predict == gp.predict for a real GPCache."""
    from tests.test_gp import make_gp

    params = make_gp()
    cache = gp.precompute(params, jitter=1e-8)
    xnew = jnp.asarray(rng.normal(size=(40, 3)))
    m1, v1 = gp.predict(cache, xnew)
    m2, v2 = gp.predict_fast(cache, xnew)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-10)


def test_analytic_vjp_matches_autodiff(rng):
    """The hand-derived backward must equal jax autodiff of the same
    forward math for every input."""
    inputs = make_inputs(rng)

    def ref(*args):
        mean, var, _ = gp_predict._reference_forward(*args)
        return mean, var

    gm = jnp.asarray(rng.normal(size=(37, 3)))
    gv = jnp.asarray(rng.normal(size=(37, 3)))

    _, vjp_ref = jax.vjp(ref, *inputs)
    want = vjp_ref((gm, gv))
    _, vjp_fused = jax.vjp(gp_predict.fused_predict, *inputs)
    got = vjp_fused((gm, gv))

    assert len(got) == len(want) == 7
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-7, atol=1e-10, err_msg=f"arg {i}"
        )


def test_grad_through_scan(rng):
    """fused_predict must be differentiable inside a lax.scan (the
    production usage pattern)."""
    inputs = make_inputs(rng, n=8, d=2)
    x0 = inputs[0][:4, :]

    def loss(kinv, alpha):
        def step(x, _):
            m, v = gp_predict.fused_predict(
                x, inputs[1], inputs[2], inputs[3], kinv, alpha, inputs[6]
            )
            return x + 0.1 * m @ jnp.ones((2, x.shape[1])), jnp.sum(v)

        xf, vs = jax.lax.scan(step, x0[:, :], None, length=5)
        return jnp.sum(xf) + jnp.sum(vs)

    g_kinv, g_alpha = jax.grad(loss, argnums=(0, 1))(inputs[4], inputs[5])
    assert np.isfinite(np.asarray(g_kinv)).all()
    assert np.abs(np.asarray(g_alpha)).max() > 0


def test_pallas_kernel_interpret_mode(rng):
    """Run the actual pallas kernel in interpreter mode on CPU and check
    against the jnp forward (f32)."""
    import functools

    from jax.experimental import pallas as pl

    inputs = make_inputs(rng, n=19, m=7, di=4, d=2, dtype=jnp.float32)
    want_mean, want_var, _ = gp_predict._reference_forward(*inputs)

    orig = pl.pallas_call
    with jax.disable_jit():
        try:
            pl.pallas_call = functools.partial(orig, interpret=True)
            got_mean, got_var = gp_predict._pallas_forward(*inputs, tile_n=8)
            rm, rv, rkmn, rw = gp_predict._pallas_forward(
                *inputs, tile_n=8, with_residuals=True
            )
        finally:
            pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(want_mean), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_var), np.asarray(want_var), rtol=2e-5, atol=1e-5)
    # residual-emitting variant returns the same stats plus kmn/w that
    # match the jnp forward's intermediates
    _, _, (want_xs, want_kmn, want_w) = gp_predict._reference_forward(*inputs)
    np.testing.assert_allclose(np.asarray(rm), np.asarray(want_mean), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(want_var), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rkmn), np.asarray(want_kmn), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rw), np.asarray(want_w), rtol=2e-5, atol=1e-5)


def test_analytic_vjp_masks_d2_clamp(rng):
    """Queries NEARLY coincident with large-norm inducing points drive
    d2raw = xn - 2*cross + zn negative by float cancellation while
    xs != zs; the forward clamps d2 to 0 there, so the gradient through
    d2 must be zero, matching autodiff — regression: the analytic
    backward used to propagate -0.5*kmn*d_kmn through clamped entries
    (an O(|xs - zs|) error). Exact coincidence would NOT catch this:
    the erroneous term is proportional to (xs - zs)."""
    rng = np.random.default_rng(0)  # pinned: gives clamps but no ties
    x, zs, inv_ls, kvar, kinv, alpha, var_q = make_inputs(rng, n=6)
    # large-norm inducing points + tiny query offsets: true d2 ~ 1e-10
    # is at the ~eps*|xn| cancellation noise, so some d2raw go negative
    # with xs strictly != zs. Exact-zero TIES are excluded below — at a
    # tie jnp.maximum's autodiff subgradient (1/2) legitimately differs
    # from the strict mask (same convention as ops/gp_adjoint.py).
    zs = zs + 1e3
    x = (zs[0:6] + rng.normal(size=x.shape) * 1e-5) / inv_ls
    xs = x * inv_ls
    d2raw = (
        jnp.sum(xs**2, -1)[:, None]
        - 2.0 * jnp.matmul(xs, zs.T, precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(zs**2, -1)[None, :]
    )
    assert int((d2raw < 0).sum()) > 0, "test setup: clamp never engaged"
    assert int((d2raw == 0).sum()) == 0, "test setup: tie entries present"
    assert (np.asarray(xs[:6]) != np.asarray(zs[:6])).all()

    def ref(*args):
        mean, var, _ = gp_predict._reference_forward(*args)
        return mean, var

    gm = jnp.asarray(rng.normal(size=(6, 3)))
    gv = jnp.asarray(rng.normal(size=(6, 3)))
    inputs = (x, zs, inv_ls, kvar, kinv, alpha, var_q)
    _, vjp_ref = jax.vjp(ref, *inputs)
    want = vjp_ref((gm, gv))
    _, vjp_fused = jax.vjp(gp_predict.fused_predict, *inputs)
    got = vjp_fused((gm, gv))
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-7, atol=1e-10,
            err_msg=f"arg {i}",
        )
