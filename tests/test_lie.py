import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from cofusion_tpu.ops import lie


def random_rotvecs(rng, n=32, scale=2.0):
    return rng.standard_normal((n, 3)) * scale


def test_so3_exp_matches_scipy(rng):
    w = random_rotvecs(rng).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_so3_exp_small_angle(rng):
    w = (rng.standard_normal((8, 3)) * 1e-8).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), R.shape), atol=1e-6)
    assert np.isfinite(R).all()


def test_so3_log_roundtrip(rng):
    w = random_rotvecs(rng, scale=1.5).astype(np.float32)
    R = lie.so3_exp(jnp.asarray(w))
    w2 = np.asarray(lie.so3_log(R))
    # log returns the principal rotation vector (angle <= pi); compare as rotations
    R2 = np.asarray(lie.so3_exp(jnp.asarray(w2)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=2e-4)


def test_se3_exp_rt_structure(rng):
    xi = rng.standard_normal(6).astype(np.float32)
    T = np.asarray(lie.se3_exp_rt(jnp.asarray(xi)))
    # translation block is the raw t (reference computeUpdateSE3 convention)
    np.testing.assert_allclose(T[:3, 3], xi[:3], atol=1e-6)
    np.testing.assert_allclose(T[:3, :3], Rotation.from_rotvec(xi[3:]).as_matrix(), atol=1e-5)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=0)


def test_invert_rt(rng):
    w = rng.standard_normal(3)
    t = rng.standard_normal(3)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_rotvec(w).as_matrix()
    T[:3, 3] = t
    Tinv = np.asarray(lie.invert_rt(jnp.asarray(T)))
    np.testing.assert_allclose(Tinv @ T, np.eye(4), atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_quat_roundtrip(seed):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((16, 3)) * 2.0
    R = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    q = np.asarray(lie.rotmat_to_quat(jnp.asarray(R)))
    q_ref = Rotation.from_matrix(R).as_quat()  # scipy order: (x, y, z, w)
    # quaternions are sign-ambiguous
    sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q_ref, atol=1e-4)
    R2 = np.asarray(lie.quat_to_rotmat(jnp.asarray(q)))
    np.testing.assert_allclose(R2, R, atol=1e-4)
