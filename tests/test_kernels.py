import jax.numpy as jnp
import numpy as np

from cbfssm_tpu.ops import kernels


def naive_rbf(x, z, variance, lengthscales):
    out = np.zeros((x.shape[0], z.shape[0]))
    for i in range(x.shape[0]):
        for j in range(z.shape[0]):
            d = (x[i] - z[j]) / lengthscales
            out[i, j] = variance * np.exp(-0.5 * np.sum(d * d))
    return out


def test_cross_matches_naive(rng):
    x = rng.normal(size=(7, 3))
    z = rng.normal(size=(5, 3))
    ls = np.array([0.5, 1.0, 2.0])
    var = 0.7
    got = np.asarray(kernels.rbf_cross(jnp.asarray(x), jnp.asarray(z), var, jnp.asarray(ls)))
    np.testing.assert_allclose(got, naive_rbf(x, z, var, ls), rtol=1e-10, atol=1e-12)


def test_gram_symmetric_psd(rng):
    z = rng.normal(size=(20, 4))
    g = np.asarray(kernels.rbf_gram(jnp.asarray(z), 1.3, jnp.asarray([1.0, 2.0, 0.5, 3.0])))
    np.testing.assert_allclose(g, g.T, atol=1e-12)
    eig = np.linalg.eigvalsh(g)
    assert eig.min() > -1e-9
    np.testing.assert_allclose(np.diag(g), 1.3, rtol=1e-12)


def test_diag():
    d = np.asarray(kernels.rbf_diag(6, 2.5, jnp.float64))
    np.testing.assert_allclose(d, 2.5)
    assert d.shape == (6,)


def test_square_dist_nonnegative(rng):
    # Cancellation can push the matmul form slightly negative; we clamp.
    x = rng.normal(size=(50, 2)) * 1e-4
    d2 = np.asarray(kernels.scaled_square_dist(jnp.asarray(x), jnp.asarray(x), 1.0))
    assert (d2 >= 0).all()
    np.testing.assert_allclose(np.diag(d2), 0.0, atol=1e-12)
