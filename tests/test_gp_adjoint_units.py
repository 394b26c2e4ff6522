"""Unit-level validation of ops/gp_adjoint.py against jax.vjp.

The model-level suite (tests/test_adjoint.py) pins end-to-end gradient
equality; these tests isolate the two building blocks — the in-chain
input pullback and the deferred cache accumulation — against autodiff
of ``gp.predict`` itself, so a future regression localizes immediately.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cbfssm_tpu.ops import gp, gp_adjoint


def make_cache(key=0, in_dim=5, out_dim=3, m=12):
    params = gp.init_sparse_gp(
        jax.random.PRNGKey(key), in_dim, out_dim, m,
        gp_var=0.3, gp_len=1.2, zeta_mean=0.05, zeta_pos=2.0,
        zeta_var=0.0001, dtype=jnp.float64,
    )
    return params, gp.precompute(params, 1e-8)


def test_predict_batch_matches_predict(rng):
    _, cache = make_cache()
    x = jnp.asarray(rng.normal(size=(40, 5)))
    pre = gp_adjoint.predict_batch(cache, x)
    mean, var = gp.predict(cache, x)
    np.testing.assert_array_equal(np.asarray(pre["gm0"]), np.asarray(mean))
    np.testing.assert_array_equal(np.asarray(pre["gv0"]), np.asarray(var))


def test_link_bwd_matches_vjp_input_cotangent(rng):
    _, cache = make_cache()
    x = jnp.asarray(rng.normal(size=(40, 5)))
    d_mean = jnp.asarray(rng.normal(size=(40, 3)))
    d_var = jnp.asarray(rng.normal(size=(40, 3)))

    _, vjp = jax.vjp(lambda xx: gp.predict(cache, xx), x)
    (want,) = vjp((d_mean, d_var))

    pre = gp_adjoint.predict_batch(cache, x)
    got = gp_adjoint.link_bwd(cache, pre, d_mean, d_var)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9)


def test_deferred_cache_grads_match_vjp(rng):
    _, cache = make_cache()
    x = jnp.asarray(rng.normal(size=(40, 5)))
    d_mean = jnp.asarray(rng.normal(size=(40, 3)))
    d_var = jnp.asarray(rng.normal(size=(40, 3)))

    _, vjp = jax.vjp(lambda c: gp.predict(c, x), cache)
    (want,) = vjp((d_mean, d_var))

    pre = gp_adjoint.predict_batch(cache, x)
    got = gp_adjoint.deferred_cache_grads(cache, pre, x, d_mean, d_var)
    for field in ("kinv_alpha", "var_q", "kern_var", "kern_len", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, field)),
            np.asarray(getattr(want, field)),
            rtol=1e-9,
            atol=1e-12,
            err_msg=field,
        )
    # fields the predict path never reads carry exact-zero cotangents in
    # both formulations
    for field in ("chol", "kinv", "kinv_diag", "alpha", "inv_ls", "zs"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, field)), 0.0, err_msg=field
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(want, field)), 0.0, err_msg=field
        )
