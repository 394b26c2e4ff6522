import jax
import jax.numpy as jnp
import numpy as np

from cbfssm_tpu.ops import gp, kernels


def make_gp(key=0, in_dim=3, out_dim=2, m=15):
    params = gp.init_sparse_gp(
        jax.random.PRNGKey(key),
        in_dim=in_dim,
        out_dim=out_dim,
        num_points=m,
        gp_var=0.25,
        gp_len=2.0,
        zeta_mean=0.0025,
        zeta_pos=2.0,
        zeta_var=0.0001,
        dtype=jnp.float64,
    )
    # Perturb mean so it is not ~0 and the tests are non-trivial.
    params = params.replace(
        mean=params.mean + 0.3 * jax.random.normal(jax.random.PRNGKey(7), params.mean.shape, dtype=jnp.float64)
    )
    return params


def test_init_distributions():
    params = make_gp(m=4000, in_dim=2, out_dim=1)
    z = np.asarray(params.z)
    assert z.min() >= -2.0 and z.max() <= 2.0
    assert abs(z.mean()) < 0.1
    mean = np.asarray(params.mean - 0.3 * np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), params.mean.shape, dtype=jnp.float64)))
    assert mean.min() >= 0.0 and mean.max() <= 0.0025
    np.testing.assert_allclose(np.asarray(params.var), 0.0001, rtol=1e-6)
    np.testing.assert_allclose(float(params.kern_var), 0.25, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params.kern_len), 2.0, rtol=1e-6)


def test_solvefree_predict_matches_reference(rng):
    params = make_gp()
    xnew = jnp.asarray(rng.normal(size=(40, 3)))
    cache = gp.precompute(params, jitter=1e-8)
    mean_fast, var_fast = gp.predict(cache, xnew)
    mean_ref, var_ref = gp.predict_reference(params, xnew, jitter=1e-8)
    np.testing.assert_allclose(np.asarray(mean_fast), np.asarray(mean_ref), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(var_fast), np.asarray(var_ref), rtol=1e-7, atol=1e-10)


def test_predict_matches_dense_formula(rng):
    """Check against the textbook sparse-GP predictive computed with
    dense numpy linear algebra."""
    params = make_gp(in_dim=2, out_dim=1, m=10)
    xnew = rng.normal(size=(25, 2))
    jitter = 1e-8

    kzz = np.asarray(kernels.rbf_gram(params.z, params.kern_var, params.kern_len))
    kzz = kzz + jitter * np.eye(10)
    kxz = np.asarray(kernels.rbf_cross(jnp.asarray(xnew), params.z, params.kern_var, params.kern_len))
    kinv = np.linalg.inv(kzz)
    mean_want = kxz @ kinv @ np.asarray(params.mean)
    qf = np.einsum("nm,mk,nk->n", kxz, kinv, kxz)
    w = kxz @ kinv
    var_want = (float(params.kern_var) - qf)[:, None] + (w**2) @ np.asarray(params.var)

    cache = gp.precompute(params, jitter=jitter)
    mean_got, var_got = gp.predict(cache, jnp.asarray(xnew))
    np.testing.assert_allclose(np.asarray(mean_got), mean_want, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(var_got), var_want, rtol=1e-6, atol=1e-10)


def test_predict_at_inducing_points_recovers_mean():
    """With tiny variational variance, predicting at Z returns ~mean."""
    params = make_gp(in_dim=2, out_dim=2, m=8)
    cache = gp.precompute(params, jitter=1e-12)
    mean, var = gp.predict(cache, params.z)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(params.mean), rtol=1e-5, atol=1e-7)
    # Posterior variance at inducing points ~ variational variance.
    assert np.asarray(var).max() < 2e-4


def test_prior_kl_matches_dense(rng):
    params = make_gp(in_dim=2, out_dim=3, m=12)
    jitter = 1e-8
    cache = gp.precompute(params, jitter=jitter)

    kzz = np.asarray(kernels.rbf_gram(params.z, params.kern_var, params.kern_len))
    # The prior covariance is the jittered Gram (its Cholesky is what the
    # reference uses as scale_tril, gp_tf.py:163-166).
    chol = np.asarray(cache.chol)
    kprior = chol @ chol.T
    kinv = np.linalg.inv(kprior)
    want = 0.0
    m = 12
    for d in range(3):
        sq = np.diag(np.asarray(cache.var_q)[:, d])
        mu = np.asarray(params.mean)[:, d]
        want += 0.5 * (
            np.trace(kinv @ sq)
            + mu @ kinv @ mu
            - m
            + np.linalg.slogdet(kprior)[1]
            - np.linalg.slogdet(sq)[1]
        )
    got = float(gp.prior_kl(params, cache))
    np.testing.assert_allclose(got, want, rtol=1e-8)
    # KL must be positive for a non-prior q.
    assert got > 0
    del kzz


def test_precompute_pair_matches_single(rng):
    """The batched two-GP factorization is numerically equivalent to two
    single precompute() calls (same per-matrix operations, batched)."""
    import jax

    from cbfssm_tpu.ops.gp import precompute, precompute_pair

    pa = make_gp(key=1, in_dim=3, out_dim=2, m=15)
    pb = make_gp(key=2, in_dim=3, out_dim=4, m=15)
    ca, cb = precompute_pair(pa, pb, 1e-8)
    sa, sb = precompute(pa, 1e-8), precompute(pb, 1e-8)
    for got, want in ((ca, sa), (cb, sb)):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-13, atol=1e-15
            ),
            got,
            want,
        )


def test_predict_rows_bitwise_equals_layout_flatten(rng):
    """predict_rows (batch-major ND flatten, the sharding-safe path) is
    BITWISE identical per element to flattening in layout order — rows
    are independent, so the flatten order is semantically free. This is
    the single-device half of the round-5 sharding contract (the mesh
    half is tests/test_collective_census.py)."""
    params = make_gp()
    cache = gp.precompute(params, jitter=1e-8)

    for shape, batch_axis in [((2, 8, 4, 3), 1), ((2, 5, 8, 4, 3), 2),
                              ((8, 4, 3), 0)]:
        x = jnp.asarray(rng.normal(size=shape))
        fmean, fvar = gp.predict_rows(gp.predict, cache, x, batch_axis)
        want_m, want_v = gp.predict(cache, x.reshape(-1, shape[-1]))
        want_m = want_m.reshape(shape[:-1] + (want_m.shape[-1],))
        want_v = want_v.reshape(shape[:-1] + (want_v.shape[-1],))
        assert fmean.shape == want_m.shape, (shape, batch_axis)
        np.testing.assert_array_equal(np.asarray(fmean), np.asarray(want_m))
        np.testing.assert_array_equal(np.asarray(fvar), np.asarray(want_v))
