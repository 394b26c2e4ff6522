"""Euler <-> quaternion / matrix conversions (host-side, numpy).

The reference vendors Gohlke's 1,941-line ``transformations.py`` but uses
exactly three functions, always with ``axes='rxyz'`` — intrinsic
rotations about x, then the new y, then the new z
(reference cbfssm/utils/hom_transform.py:1053,1174,1185 via
voliro_loader.py:7). That convention is scipy's ``'XYZ'``; quaternions
are scalar-first (w, x, y, z). These wrappers are vectorized over leading
batch dimensions (the reference loops per-row in Python).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation

_INTRINSIC_XYZ = "XYZ"


def _quat_wxyz_to_xyzw(q):
    q = np.asarray(q, dtype=np.float64)
    return np.concatenate((q[..., 1:], q[..., :1]), axis=-1)


def _quat_xyzw_to_wxyz(q):
    return np.concatenate((q[..., 3:], q[..., :3]), axis=-1)


def euler_from_quaternion(quat_wxyz):
    """Intrinsic-XYZ Euler angles [..., 3] from wxyz quaternions [..., 4]."""
    q = _quat_wxyz_to_xyzw(quat_wxyz)
    flat = q.reshape(-1, 4)
    angles = Rotation.from_quat(flat).as_euler(_INTRINSIC_XYZ)
    return angles.reshape(q.shape[:-1] + (3,))


def quaternion_from_euler(roll, pitch, yaw):
    """wxyz quaternions from intrinsic-XYZ Euler angles (broadcastable)."""
    angles = np.stack(np.broadcast_arrays(roll, pitch, yaw), axis=-1)
    flat = angles.reshape(-1, 3)
    q = Rotation.from_euler(_INTRINSIC_XYZ, flat).as_quat()
    return _quat_xyzw_to_wxyz(q).reshape(angles.shape[:-1] + (4,))


def euler_matrix(roll, pitch, yaw):
    """3x3 rotation matrices [..., 3, 3] from intrinsic-XYZ Euler angles."""
    angles = np.stack(np.broadcast_arrays(roll, pitch, yaw), axis=-1)
    flat = angles.reshape(-1, 3)
    mats = Rotation.from_euler(_INTRINSIC_XYZ, flat).as_matrix()
    return mats.reshape(angles.shape[:-1] + (3, 3))
