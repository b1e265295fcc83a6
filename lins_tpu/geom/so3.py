"""SO(3) / quaternion / Euler utilities, TPU-native (pure jnp, batched via vmap).

Re-implements the math layer of the LINS reference (lins/include/math_utils.h:43-321)
as dtype-polymorphic JAX functions.  Quaternions are stored as (..., 4) arrays in
**wxyz** order (scalar first).  All functions broadcast over leading axes and are
safe to `vmap`/`jit`; small-angle branches use `jnp.where` rather than Python
control flow so everything traces to a single XLA program.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-10


def wrap_pi(x):
    """Wrap angle to (-pi, pi]."""
    return x - 2.0 * jnp.pi * jnp.floor((x + jnp.pi) / (2.0 * jnp.pi))


def skew(v):
    """Skew-symmetric matrix of v: (..., 3) -> (..., 3, 3).

    Matches math_utils.h:197-204.
    """
    z = jnp.zeros_like(v[..., 0])
    row0 = jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1)
    row1 = jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1)
    row2 = jnp.stack([-v[..., 1], v[..., 0], z], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


# ---------------------------------------------------------------------------
# Quaternion algebra (wxyz)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32, batch_shape=()):
    q = jnp.zeros(batch_shape + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_mul(q, p):
    """Hamilton product q ⊗ p, both (..., 4) wxyz."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pw, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    return jnp.stack(
        [
            qw * pw - qx * px - qy * py - qz * pz,
            qw * px + qx * pw + qy * pz - qz * py,
            qw * py - qx * pz + qy * pw + qz * px,
            qw * pz + qx * py - qy * px + qz * pw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q):
    """Inverse of a (near-)unit quaternion = conjugate / |q|^2."""
    return quat_conj(q) / jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), _EPS)


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_rotate(q, v):
    """Rotate vector(s) v (..., 3) by unit quaternion(s) q (..., 4).

    Uses the expanded 15-mul form (no matrix materialisation) — VPU friendly.
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q, v):
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q):
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def mat_to_quat(R):
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz.

    Branch-free Shepperd's method via jnp.where (stable for all traces).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidate constructions
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, s1 / 4.0, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)
    s2 = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, s2 / 4.0,
                    (m12 + m21) / s2], axis=-1)
    s3 = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    s3 / 4.0], axis=-1)

    cond0 = tr > 0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(cond0[..., None], q0,
                  jnp.where(cond1[..., None], q1,
                            jnp.where(cond2[..., None], q2, q3)))
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# Exponential / logarithm maps
# ---------------------------------------------------------------------------

def exp_axis(vec):
    """Axis-angle vector (..., 3) -> unit quaternion (..., 4).

    Matches axis2Quat (math_utils.h:43-73) with the small-angle identity branch.
    """
    theta = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    small = theta < _EPS
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    axis = vec / safe_theta
    half = theta / 2.0
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)
    q = jnp.concatenate([w, xyz], axis=-1)
    identity = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where(small, identity, q)


def log_quat(q):
    """Unit quaternion (..., 4) -> axis-angle vector (..., 3).

    Matches Quat2axis (math_utils.h:75-88) including wrap_pi of the angle.
    """
    vec = q[..., 1:4]
    mag = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    small = mag < _EPS
    safe = jnp.where(small, jnp.ones_like(mag), mag)
    angle = wrap_pi(2.0 * jnp.arctan2(mag, q[..., 0:1]))
    return jnp.where(small, vec, vec / safe * angle)


def delta_q(theta):
    """First-order quaternion increment [1, theta/2] (math_utils.h:219-232)."""
    half = theta / 2.0
    w = jnp.ones_like(half[..., :1])
    return jnp.concatenate([w, half], axis=-1)


def rinv_left(axis):
    """Inverse of the SO(3) left Jacobian (math_utils.h:304-321).

    J_l^{-1}(phi) = (theta/2)cot(theta/2) I + (1 - (theta/2)cot(theta/2)) a aᵀ
                    - (theta/2) [a]x
    """
    theta = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    small = theta < _EPS
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    a = axis / safe_theta
    half = safe_theta / 2.0
    s = half * jnp.cos(half) / jnp.sin(half)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), axis.shape[:-1] + (3, 3))
    aaT = a[..., :, None] * a[..., None, :]
    ans = (s[..., None] * eye + (1.0 - s)[..., None] * aaT
           - half[..., None] * skew(a))
    return jnp.where(small[..., None], eye, ans)


# ---------------------------------------------------------------------------
# Euler conversions (roll-pitch-yaw, matching math_utils.h conventions)
# ---------------------------------------------------------------------------

def rpy_to_quat(rpy):
    """(roll, pitch, yaw) (..., 3) -> quaternion.  Matches rpy2Quat (math_utils.h:131-148)."""
    half_r, half_p, half_y = rpy[..., 0] / 2, rpy[..., 1] / 2, rpy[..., 2] / 2
    cr, sr = jnp.cos(half_r), jnp.sin(half_r)
    cp, sp = jnp.cos(half_p), jnp.sin(half_p)
    cy, sy = jnp.cos(half_y), jnp.sin(half_y)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def ypr_to_quat(ypr):
    """(yaw, pitch, roll) -> quaternion (math_utils.h:112-129)."""
    return rpy_to_quat(jnp.stack([ypr[..., 2], ypr[..., 1], ypr[..., 0]], axis=-1))


def rpy_to_mat(rpy):
    """Rz(yaw) Ry(pitch) Rx(roll) (math_utils.h:163-182)."""
    return quat_to_mat(rpy_to_quat(rpy))


def mat_to_rpy(R):
    """Rotation matrix -> (roll, pitch, yaw) (math_utils.h:184-190)."""
    pitch = jnp.arctan2(-R[..., 2, 0],
                        jnp.sqrt(R[..., 2, 1] ** 2 + R[..., 2, 2] ** 2))
    cp = jnp.cos(pitch)
    roll = jnp.arctan2(R[..., 2, 1] / cp, R[..., 2, 2] / cp)
    yaw = jnp.arctan2(R[..., 1, 0] / cp, R[..., 0, 0] / cp)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_rpy(q):
    return mat_to_rpy(quat_to_mat(q))


def mat_to_ypr(R):
    rpy = mat_to_rpy(R)
    return jnp.stack([rpy[..., 2], rpy[..., 1], rpy[..., 0]], axis=-1)


def deg2rad(x):
    return x * (jnp.pi / 180.0)


def rad2deg(x):
    return x * (180.0 / jnp.pi)
