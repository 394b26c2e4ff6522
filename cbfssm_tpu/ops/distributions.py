"""Closed-form Gaussian / Beta quantities.

Replaces the reference's use of ``tf.contrib.distributions``
(MultivariateNormalDiag / MultivariateNormalTriL log-probs and KLs,
cbfssm/model/gp_tf.py:163-172, cbfssm.py:245-251, voliro.py:262-271) with
explicit closed forms — all elementwise / reduction ops that XLA fuses.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln

from cbfssm_tpu.ops import linalg

_LOG_2PI = math.log(2.0 * math.pi)


def diag_gaussian_logpdf(x, mean, var, axis=-1):
    """log N(x | mean, diag(var)), summed over ``axis``."""
    ll = -0.5 * (_LOG_2PI + jnp.log(var) + jnp.square(x - mean) / var)
    return jnp.sum(ll, axis=axis)


def diag_gaussian_entropy(var, axis=-1):
    """Entropy of N(·, diag(var)): 0.5 * sum(log(2 pi e var))."""
    return 0.5 * jnp.sum(_LOG_2PI + 1.0 + jnp.log(var), axis=axis)


def kl_diag_gaussians(mean_q, var_q, mean_p, var_p, axis=-1):
    """KL(N(mean_q, diag var_q) || N(mean_p, diag var_p)) over ``axis``.

    Matches the conditioning regularizer form used per-timestep in the
    reference forward pass (cbfssm.py:232-235).
    """
    kl = jnp.log(var_p) - jnp.log(var_q) + (var_q + jnp.square(mean_q - mean_p)) / var_p - 1.0
    return 0.5 * jnp.sum(kl, axis=axis)


def kl_diag_vs_tril(mean_q, var_q, chol_p, kinv_p_diag, kinv_mean):
    """KL( N(mean_q, diag var_q) || N(0, K) ) summed over output dims.

    mean_q, var_q : [M, D] variational mean / diagonal variance per output dim
    chol_p        : [M, M] lower Cholesky factor of the prior covariance K
    kinv_p_diag   : [M] diagonal of K^-1 (precomputed)
    kinv_mean     : [M, D] K^-1 @ mean_q (precomputed)

    Closed form per output dim d:
      0.5 * ( tr(K^-1 diag(var_q[:, d])) + mean_d^T K^-1 mean_d
              - M + log|K| - sum_m log var_q[m, d] )
    """
    m = mean_q.shape[0]
    logdet_k = linalg.log_det_from_chol(chol_p)
    trace_term = jnp.sum(kinv_p_diag[:, None] * var_q, axis=0)  # [D]
    maha = jnp.sum(mean_q * kinv_mean, axis=0)  # [D]
    logdet_q = jnp.sum(jnp.log(var_q), axis=0)  # [D]
    kl = 0.5 * (trace_term + maha - m + logdet_k - logdet_q)
    return jnp.sum(kl)


def beta_logpdf(x, alpha, beta):
    """log Beta(x | alpha, beta), elementwise (reference voliro.py:262-271
    uses Beta priors on GP noise and lengthscales).

    The log-normalizer is evaluated host-side with ``math.lgamma``
    (exact double precision) when alpha/beta are concrete scalars — the
    normal case: they are static config hyperparameters, so folding the
    constant at trace time both shrinks the graph and avoids XLA's
    ~1e-7-relative lgamma approximation. Traced alphas (e.g. a
    SweepTrainer lane axis over n_beta/l_beta) fall back to the jnp
    path."""
    try:
        log_norm = (
            math.lgamma(float(alpha))
            + math.lgamma(float(beta))
            - math.lgamma(float(alpha) + float(beta))
        )
    except (TypeError, ValueError, jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        log_norm = betaln(alpha, beta)
    return (alpha - 1.0) * jnp.log(x) + (beta - 1.0) * jnp.log1p(-x) - log_norm
