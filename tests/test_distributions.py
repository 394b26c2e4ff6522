import math

import jax.numpy as jnp
import numpy as np
from scipy import stats

from cbfssm_tpu.ops import distributions as dists


def test_diag_gaussian_logpdf(rng):
    x = rng.normal(size=(4, 3))
    mean = rng.normal(size=(4, 3))
    var = rng.uniform(0.1, 2.0, size=(4, 3))
    got = np.asarray(dists.diag_gaussian_logpdf(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(var)))
    for i in range(4):
        want = stats.multivariate_normal.logpdf(x[i], mean[i], np.diag(var[i]))
        np.testing.assert_allclose(got[i], want, rtol=1e-10)


def test_entropy_matches_scipy(rng):
    var = rng.uniform(0.1, 3.0, size=(5, 2))
    got = np.asarray(dists.diag_gaussian_entropy(jnp.asarray(var)))
    for i in range(5):
        want = stats.multivariate_normal.entropy(np.zeros(2), np.diag(var[i]))
        np.testing.assert_allclose(got[i], want, rtol=1e-10)


def test_entropy_matches_reference_form(rng):
    # Reference computes 0.5 * sum(log(2 pi e) + log(fvar)) (cbfssm.py:154-155).
    var = rng.uniform(0.01, 1.0, size=(7,))
    got = float(dists.diag_gaussian_entropy(jnp.asarray(var)))
    want = 0.5 * np.sum(np.log(2 * np.pi * np.e) + np.log(var))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_kl_diag_gaussians(rng):
    mq = rng.normal(size=3)
    vq = rng.uniform(0.5, 1.5, size=3)
    mp = rng.normal(size=3)
    vp = rng.uniform(0.5, 1.5, size=3)
    got = float(dists.kl_diag_gaussians(jnp.asarray(mq), jnp.asarray(vq), jnp.asarray(mp), jnp.asarray(vp)))
    # Monte-Carlo-free check via full-covariance formula.
    want = 0.5 * (
        np.sum(vq / vp)
        + np.sum((mp - mq) ** 2 / vp)
        - 3
        + np.sum(np.log(vp))
        - np.sum(np.log(vq))
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)
    assert got >= 0


def test_kl_same_distribution_zero(rng):
    m = rng.normal(size=4)
    v = rng.uniform(0.1, 1.0, size=4)
    got = float(dists.kl_diag_gaussians(jnp.asarray(m), jnp.asarray(v), jnp.asarray(m), jnp.asarray(v)))
    np.testing.assert_allclose(got, 0.0, atol=1e-12)


def test_beta_logpdf(rng):
    x = rng.uniform(0.05, 0.95, size=10)
    got = np.asarray(dists.beta_logpdf(jnp.asarray(x), 10.0, 2.0))
    want = stats.beta.logpdf(x, 10.0, 2.0)
    # concrete alpha/beta: log-normalizer folded host-side with
    # math.lgamma — exact double precision
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_beta_logpdf_traced_alpha(rng):
    """Traced alpha/beta (a SweepTrainer lane axis over Beta hypers)
    must fall back to the jnp normalizer and still be correct to XLA's
    lgamma accuracy."""
    import jax

    x = rng.uniform(0.05, 0.95, size=10)
    alphas = jnp.asarray([10.0, 3.0])
    betas = jnp.asarray([2.0, 5.0])
    got = np.asarray(
        jax.jit(jax.vmap(lambda a, b: dists.beta_logpdf(jnp.asarray(x), a, b)))(
            alphas, betas
        )
    )
    want = np.stack(
        [stats.beta.logpdf(x, 10.0, 2.0), stats.beta.logpdf(x, 3.0, 5.0)]
    )
    # jax's gammaln is a polynomial approximation — ~1e-6 relative.
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_reference_kl_x_form(rng):
    """The per-step conditioning KL in the reference (cbfssm.py:232-233) is
    log(fvar) - log(sig) + (sig + (mu-fmean)^2)/fvar - 1, times 0.5 —
    i.e. KL(N(mu, sig) || N(fmean, fvar))."""
    fmean = rng.normal(size=5)
    fvar = rng.uniform(0.5, 1.5, size=5)
    mu = rng.normal(size=5)
    sig = rng.uniform(0.5, 1.5, size=5)
    ref_form = 0.5 * np.sum(np.log(fvar) - np.log(sig) + (sig + (mu - fmean) ** 2) / fvar - 1.0)
    got = float(dists.kl_diag_gaussians(jnp.asarray(mu), jnp.asarray(sig), jnp.asarray(fmean), jnp.asarray(fvar)))
    np.testing.assert_allclose(got, ref_form, rtol=1e-10)


def test_log2pi_constant():
    assert abs(dists._LOG_2PI - math.log(2 * math.pi)) < 1e-15
