import jax.numpy as jnp
import numpy as np

from cbfssm_tpu.ops import linalg


def spd_matrix(rng, n):
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def test_jittered_cholesky(rng):
    k = spd_matrix(rng, 12)
    chol = np.asarray(linalg.jittered_cholesky(jnp.asarray(k), jitter=1e-8))
    np.testing.assert_allclose(chol @ chol.T, k + 1e-8 * np.eye(12), rtol=1e-10)
    assert np.allclose(chol, np.tril(chol))


def test_default_jitter_by_dtype():
    assert linalg.default_jitter(jnp.float64) == 1e-8
    assert linalg.default_jitter(jnp.float32) == 1e-6


def test_cholesky_inverse(rng):
    k = spd_matrix(rng, 9)
    chol = linalg.jittered_cholesky(jnp.asarray(k), jitter=0.0)
    kinv = np.asarray(linalg.cholesky_inverse(chol))
    np.testing.assert_allclose(kinv, np.linalg.inv(k), rtol=1e-8, atol=1e-10)


def test_cho_solve(rng):
    k = spd_matrix(rng, 9)
    b = rng.normal(size=(9, 3))
    chol = linalg.jittered_cholesky(jnp.asarray(k), jitter=0.0)
    x = np.asarray(linalg.cho_solve(chol, jnp.asarray(b)))
    np.testing.assert_allclose(k @ x, b, rtol=1e-8, atol=1e-10)


def test_log_det(rng):
    k = spd_matrix(rng, 7)
    chol = linalg.jittered_cholesky(jnp.asarray(k), jitter=0.0)
    got = float(linalg.log_det_from_chol(chol))
    want = np.linalg.slogdet(k)[1]
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_f32_input_upcast_path(rng):
    # With x64 enabled (conftest), f32 input should factorize in f64 and
    # cast back — mirroring reference cast_cholesky (gp_tf.py:57-65).
    k = spd_matrix(rng, 8).astype(np.float32)
    chol = linalg.jittered_cholesky(jnp.asarray(k))
    assert chol.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(chol @ chol.T), k, rtol=1e-5, atol=1e-5
    )
