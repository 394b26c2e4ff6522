"""ARD squared-exponential (RBF) kernel.

Capability parity with the reference's GPFlow-derived RBF
(cbfssm/model/gp_tf.py:20-49): k(x, x') = variance *
exp(-0.5 * || (x - x') / lengthscales ||^2), with per-input-dimension
lengthscales.

TPU-first layout: the cross-Gram ``K(X, Z)`` is computed as one matmul
(after scaling by inverse lengthscales) plus rank-1 row/column norm
corrections — this keeps the FLOPs on the MXU and lets XLA fuse the
``exp`` into the matmul epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# GP variances in this framework go down to ~1e-6 (e.g. var_x = 0.002^2 in
# the small-scale configs); the default TPU matmul precision (bf16 passes)
# would swamp them, so kernel/GP matmuls request full f32 accumulation.
HIGHEST = jax.lax.Precision.HIGHEST


def scaled_square_dist(x, z, lengthscales, precision=HIGHEST):
    """Pairwise squared distances of rows of ``x`` and ``z`` after
    dividing each input dimension by its lengthscale.

    x: [N, D], z: [M, D], lengthscales: [D] (or scalar) -> [N, M]
    """
    xs = x / lengthscales
    zs = z / lengthscales
    xn = jnp.sum(jnp.square(xs), axis=-1)  # [N]
    zn = jnp.sum(jnp.square(zs), axis=-1)  # [M]
    cross = jnp.matmul(xs, zs.T, precision=precision)  # MXU matmul [N, M]
    d2 = xn[:, None] - 2.0 * cross + zn[None, :]
    # Guard tiny negative values from cancellation; keeps sqrt/exp clean.
    return jnp.maximum(d2, 0.0)


def rbf_cross(x, z, variance, lengthscales, precision=HIGHEST):
    """K(X, Z) for the ARD-RBF kernel. x: [N, D], z: [M, D] -> [N, M]."""
    return variance * jnp.exp(
        -0.5 * scaled_square_dist(x, z, lengthscales, precision=precision)
    )


def rbf_gram(z, variance, lengthscales):
    """Symmetric Gram matrix K(Z, Z). z: [M, D] -> [M, M]."""
    return rbf_cross(z, z, variance, lengthscales)


def rbf_diag(n, variance, dtype):
    """diag(K(X, X)) — constant ``variance`` for the RBF kernel. -> [n]."""
    return jnp.full((n,), variance, dtype=dtype)
