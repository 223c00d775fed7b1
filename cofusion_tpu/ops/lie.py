"""SO(3)/SE(3) Lie-group helpers.

TPU-native rewrite of the reference's OdometryProvider (Core/Utils/OdometryProvider.h:26-90)
and Model::rodrigues2 (Core/Model/Model.cpp:816-857): branch-free, jit/vmap-safe
(Taylor-guarded small-angle paths instead of `if theta < eps`), float32.

Conventions:
  * poses are 4x4 row-major camera-to-world matrices, as in the reference;
  * `se3_exp(xi)` with xi = (t(3), w(3)) builds [[exp(w), t], [0, 1]] — exactly the
    reference's computeUpdateSE3 "infinitesimal transformation" (translation is NOT
    coupled through the V matrix, matching OdometryProvider.h:71-89).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Pose math is tiny (3x3 / 4x4) but numerically load-bearing: on TPU, default
# matmul precision is bfloat16, which costs ~3e-3 per product — fatal for pose
# chains.  Every contraction in this module pins HIGHEST precision.
_HI = jax.lax.Precision.HIGHEST


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of a 3-vector (batched over leading dims)."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula, numerically safe at theta -> 0.

    R = I + sin(t)/t [w]_x + (1-cos(t))/t^2 [w]_x^2
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    # Taylor guards (theta ~ 0): sin(t)/t -> 1 - t^2/6, (1-cos t)/t^2 -> 1/2 - t^2/24
    small = theta2 < 1e-12
    safe_theta = jnp.where(small, 1.0, theta)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe_theta) / safe_theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe_theta)) / jnp.where(small, 1.0, theta2))
    W = hat(w)
    # [w]_x^2 == w w^T - (w^T w) I  — algebraic identity; avoids a matmul entirely
    wwT = w[..., :, None] * w[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    W2 = wwT - theta2[..., None, None] * eye
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map of a rotation matrix -> axis-angle vector (safe near identity)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    vee = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2], R[..., 0, 2] - R[..., 2, 0], R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    small = theta < 1e-6
    # theta/(2 sin(theta)) -> 1/2 + theta^2/12 near 0
    safe_sin = jnp.where(small, 1.0, jnp.sin(theta))
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * safe_sin))
    return scale[..., None] * vee


def se3_exp_rt(xi: jnp.ndarray) -> jnp.ndarray:
    """Reference-style SE3 update: xi=(t, w) -> [[exp(w), t],[0,1]].

    This is *not* the exact SE(3) exponential (t is not premultiplied by V); it
    mirrors OdometryProvider::computeUpdateSE3 so the Gauss-Newton updates compose
    identically to the reference.
    """
    t, w = xi[..., :3], xi[..., 3:6]
    R = so3_exp(w)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=xi.dtype), (*xi.shape[:-1], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def make_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=R.dtype), (*R.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_rt(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid transform (R, t) -> (R^T, -R^T t)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision=_HI))


def transform_points(T: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 rigid transform to points of shape (..., 3)."""
    return jnp.einsum("ij,...j->...i", T[:3, :3], p, precision=_HI) + T[:3, 3]


def rotate_vectors(T: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("ij,...j->...i", T[:3, :3], v, precision=_HI)


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Matrix product of two 4x4 transforms at full precision."""
    return jnp.matmul(A, B, precision=_HI)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), TUM trajectory-export order.

    Branch-free Shepperd-style: computes all four candidate constructions and picks
    the best-conditioned one.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _case(tq, a, b, c, d):
        s = jnp.sqrt(jnp.maximum(tq, 1e-12)) * 2.0
        return jnp.stack([a / s, b / s, c / s, d / s], axis=-1)

    # w-dominant
    q0 = _case(1.0 + tr, m21 - m12, m02 - m20, m10 - m01, 1.0 + tr)
    # x-dominant
    q1 = _case(1.0 + m00 - m11 - m22, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12)
    # y-dominant
    q2 = _case(1.0 - m00 + m11 - m22, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20)
    # z-dominant
    q3 = _case(1.0 - m00 - m11 + m22, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01)

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0, jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3))
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (x, y, z, w) -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )
