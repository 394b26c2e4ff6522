"""Batched quaternion algebra (scalar-first, wxyz).

Capability parity with reference cbfssm/utils/quaternions.py:5-40. One
jnp implementation serves both device (jit) and host (numpy inputs)
callers — jnp ops accept numpy arrays directly.
"""

from __future__ import annotations

import jax.numpy as jnp


def multiply(a, b):
    """Hamilton product of quaternion batches [..., 4] x [..., 4]."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        (
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ),
        axis=-1,
    )


def conjugate(q):
    """Quaternion conjugate (inverse for unit quaternions)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def from_vector(v):
    """Pad a 3-vector batch [..., 3] to a pure quaternion [..., 4]."""
    zeros = jnp.zeros_like(v[..., :1])
    return jnp.concatenate((zeros, v), axis=-1)


def rotate_vector(v, q):
    """Rotate vector batch ``v`` [..., 3] by quaternion batch ``q``:
    q * (0, v) * q^-1, returning the vector part."""
    res = multiply(q, from_vector(v))
    res = multiply(res, conjugate(q))
    return res[..., 1:]


def normalize(q, axis=-1):
    """Unit-normalize quaternions along ``axis``."""
    return q / jnp.linalg.norm(q, axis=axis, keepdims=True)
