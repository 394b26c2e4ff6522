"""Jittered Cholesky and derived solves.

Capability parity with reference cbfssm/model/gp_tf.py:52-65
(``_jitter_cholesky`` / ``cast_cholesky``): the Gram factorization adds a
diagonal jitter and is optionally carried out in float64.

TPU note: the factorized matrix is tiny (M x M with M <= ~100 inducing
points), so the factorization itself is cheap; the design goal of this
module is that *everything downstream of it is a matmul* — we explicitly
form ``K^-1`` and ``K^-1 @ mean`` once per optimization step so the
time-recursion (``lax.scan``) never runs a triangular solve (triangular
solves serialize on TPU; matmuls ride the MXU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def default_jitter(dtype) -> float:
    """Diagonal jitter matched to compute precision (1e-8 in float64 like
    the reference; a larger floor in float32 keeps Cholesky PSD-safe)."""
    if jnp.dtype(dtype) == jnp.float64:
        return 1e-8
    return 1e-6


def jittered_cholesky(mat, jitter: float | None = None):
    """Lower Cholesky factor of ``mat + jitter * I``.

    If float64 is enabled (jax x64 mode) and ``mat`` is lower precision,
    the factorization is computed in float64 and cast back — mirroring
    the reference's ``cast_cholesky`` which always factorizes in f64.
    """
    dtype = mat.dtype
    if jitter is None:
        jitter = default_jitter(dtype)
    want_f64 = jax.config.jax_enable_x64 and dtype != jnp.float64
    work = mat.astype(jnp.float64) if want_f64 else mat
    eye = jnp.eye(work.shape[-1], dtype=work.dtype)
    chol = jnp.linalg.cholesky(work + jitter * eye)
    return chol.astype(dtype)


def cholesky_inverse(chol):
    """Explicit ``K^-1`` from a lower Cholesky factor (K = L L^T);
    accepts a leading batch axis ([..., M, M]).

    Formed once per step outside the scan; M x M is tiny so the extra
    FLOPs are negligible and it converts all downstream per-timestep
    triangular solves into MXU matmuls.
    """
    eye = jnp.broadcast_to(
        jnp.eye(chol.shape[-1], dtype=chol.dtype), chol.shape
    )
    linv = jax.scipy.linalg.solve_triangular(chol, eye, lower=True)
    linv_t = jnp.swapaxes(linv, -1, -2)
    return jnp.matmul(linv_t, linv, precision=jax.lax.Precision.HIGHEST)


def cho_solve(chol, b):
    """Solve ``K x = b`` given the lower Cholesky factor of K."""
    y = jax.scipy.linalg.solve_triangular(chol, b, lower=True)
    return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)


def log_det_from_chol(chol):
    """log |K| from its lower Cholesky factor."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
