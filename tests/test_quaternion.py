import numpy as np
from scipy.spatial.transform import Rotation

from cbfssm_tpu.ops import quaternion
from cbfssm_tpu.utils import rotations


def random_unit_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_multiply_matches_scipy(rng):
    a = random_unit_quats(rng, 10)
    b = random_unit_quats(rng, 10)
    got = np.asarray(quaternion.multiply(a, b))
    for i in range(10):
        ra = Rotation.from_quat(np.r_[a[i, 1:], a[i, 0]])
        rb = Rotation.from_quat(np.r_[b[i, 1:], b[i, 0]])
        rc = (ra * rb).as_quat()
        want = np.r_[rc[3], rc[:3]]
        assert np.allclose(got[i], want, atol=1e-10) or np.allclose(got[i], -want, atol=1e-10)


def test_rotate_vector_matches_scipy(rng):
    q = random_unit_quats(rng, 20)
    v = rng.normal(size=(20, 3))
    got = np.asarray(quaternion.rotate_vector(v, q))
    for i in range(20):
        want = Rotation.from_quat(np.r_[q[i, 1:], q[i, 0]]).apply(v[i])
        np.testing.assert_allclose(got[i], want, atol=1e-10)


def test_conjugate_inverts_rotation(rng):
    q = random_unit_quats(rng, 5)
    v = rng.normal(size=(5, 3))
    rotated = quaternion.rotate_vector(v, q)
    back = np.asarray(quaternion.rotate_vector(rotated, quaternion.conjugate(q)))
    np.testing.assert_allclose(back, v, atol=1e-10)


def test_from_vector_shape(rng):
    v = rng.normal(size=(3, 7, 3))
    q = np.asarray(quaternion.from_vector(v))
    assert q.shape == (3, 7, 4)
    np.testing.assert_allclose(q[..., 0], 0.0)
    np.testing.assert_allclose(q[..., 1:], v)


def test_normalize(rng):
    q = rng.normal(size=(6, 4))
    n = np.asarray(quaternion.normalize(q))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-12)


# --- host-side euler conversions (utils.rotations) ---


def test_euler_quat_roundtrip(rng):
    angles = rng.uniform(-1.2, 1.2, size=(30, 3))
    q = rotations.quaternion_from_euler(angles[:, 0], angles[:, 1], angles[:, 2])
    back = rotations.euler_from_quaternion(q)
    np.testing.assert_allclose(back, angles, atol=1e-10)


def test_euler_matrix_orthonormal(rng):
    angles = rng.uniform(-np.pi, np.pi, size=(10, 3))
    mats = rotations.euler_matrix(angles[:, 0], angles[:, 1], angles[:, 2])
    for m in mats:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-12)


def test_euler_matrix_intrinsic_xyz_golden():
    # Golden values for the reference 'rxyz' convention (verified equal to
    # Gohlke euler_matrix(a, b, c, 'rxyz') = intrinsic X-Y-Z).
    m = rotations.euler_matrix(0.3, 0.0, 0.0)
    want = np.array(
        [[1, 0, 0], [0, np.cos(0.3), -np.sin(0.3)], [0, np.sin(0.3), np.cos(0.3)]]
    )
    np.testing.assert_allclose(m, want, atol=1e-12)
    # Composition order: R = Rx @ Ry @ Rz for intrinsic xyz.
    a, b, c = 0.2, -0.4, 0.9
    rx = rotations.euler_matrix(a, 0, 0)
    ry = rotations.euler_matrix(0, b, 0)
    rz = rotations.euler_matrix(0, 0, c)
    np.testing.assert_allclose(rotations.euler_matrix(a, b, c), rx @ ry @ rz, atol=1e-12)


def test_quaternion_consistency_with_matrix(rng):
    angles = rng.uniform(-1.0, 1.0, size=(5, 3))
    q = rotations.quaternion_from_euler(angles[:, 0], angles[:, 1], angles[:, 2])
    m = rotations.euler_matrix(angles[:, 0], angles[:, 1], angles[:, 2])
    v = rng.normal(size=(5, 3))
    via_q = np.asarray(quaternion.rotate_vector(v, q))
    via_m = np.einsum("nij,nj->ni", m, v)
    np.testing.assert_allclose(via_q, via_m, atol=1e-10)
