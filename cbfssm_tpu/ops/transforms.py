"""Softplus positivity re-parameterization.

Every variance / lengthscale parameter in the framework is stored
unconstrained and mapped through ``softplus(x) + eps`` (capability parity
with reference cbfssm/model/tf_transform.py:13-21). The inverse transform
is used at parameter-initialization time only.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Floor added after softplus so constrained values are strictly positive.
_EPS = 1e-10
# Above this threshold softplus is numerically the identity; the inverse
# uses a linearization to avoid overflow in exp (same guard as the
# reference's backward transform, tf_transform.py:16).
_LINEAR_THRESHOLD = 35.0


def positive(x_unconstrained):
    """Map an unconstrained array to strictly positive values (jnp)."""
    return jnp.logaddexp(x_unconstrained, 0.0) + _EPS


def positive_inverse(y) -> np.ndarray:
    """Inverse of :func:`positive`, evaluated host-side with numpy.

    Used to initialize unconstrained parameters from positive config
    values. Requires y > 1e-10.
    """
    y = np.asarray(y, dtype=np.float64)
    if np.any(y <= _EPS):
        raise ValueError("positive_inverse requires inputs > 1e-10")
    shifted = y - _EPS
    # softplus^-1(z) = log(exp(z) - 1) = z + log1p(-exp(-z))
    with np.errstate(over="ignore"):
        inv = np.where(
            shifted > _LINEAR_THRESHOLD,
            shifted,
            np.log(np.expm1(np.where(shifted > _LINEAR_THRESHOLD, 1.0, shifted))),
        )
    return inv
