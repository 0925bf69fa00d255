"""Rotation conversions (reference: utils/rotation_conversions.py — itself a
pytorch3d copy; these are standard formulas reimplemented in jnp)."""

import jax.numpy as jnp


def axis_angle_to_matrix(axis_angle):
    """Rodrigues formula: axis-angle [..., 3] -> rotation matrix [..., 3, 3]."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    small = angle < 1e-6
    safe_angle = jnp.where(small, jnp.ones_like(angle), angle)
    axis = axis_angle / safe_angle
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    a = angle[..., None]
    R = eye + jnp.sin(a) * K + (1.0 - jnp.cos(a)) * (K @ K)
    # near-zero angle: first-order approximation I + K*angle
    R_small = eye + K * a
    return jnp.where(small[..., None], R_small, R)


def quaternion_to_matrix(q):
    """Unit quaternion (w, x, y, z) [..., 4] -> matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / jnp.maximum(n, 1e-12)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack([
        jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], -1),
        jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], -1),
        jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], -1),
    ], -2)


def quaternion_apply(q, v):
    """Rotate vectors v [..., 3] by quaternions q [..., 4] (w, x, y, z),
    matching pytorch3d.transforms.quaternion_apply semantics used by
    CalibrateEmbedding (nlf/embedding/ray.py:171)."""
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def matrix_to_quaternion(R):
    """Rotation matrix [..., 3, 3] -> quaternion (w, x, y, z), stable
    branchless variant."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw = _safe_sqrt(1.0 + tr) / 2.0
    qx = _safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    qy = _safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    qz = _safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qw, qx, qy, qz], -1)
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
