"""Batched vector/quaternion math (≙ reference src/core/math.{h,cpp}, simd_math.h).

All functions are shape-polymorphic over leading batch dimensions and operate on
trailing-axis component layout: vectors are ``[..., 3]`` float arrays, quaternions
are ``[..., 4]`` in **(x, y, z, w)** order — the same component order the reference
uses (core/math.h Quat{x,y,z,w}). The reference's SSE float4 SoA kernels
(core/simd_math.h) become plain jnp expressions: XLA maps them onto the VPU's
8x128 lanes, batching replaces hand-written SIMD.

Positions are float32. The reference stores world positions as doubles (DVec3,
core/math.h) for planetary-scale coordinates; TPUs have no fast f64, so this
engine adopts the reference's own camera-relative trick (ShiftedFrustum,
core/geometry.h) at the world level: per-world f32 coordinates with an optional
f64 world origin kept host-side.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# vectors
# ---------------------------------------------------------------------------


def vec3(x, y, z, dtype=jnp.float32):
    return jnp.stack([jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)], axis=-1)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def squared_length(v):
    return dot(v, v)


def normalize(v, eps: float = 1e-12):
    """Safe normalize: returns v * rsqrt(|v|^2); zero vectors stay zero-ish."""
    sq = jnp.maximum(dot(v, v), eps)
    return v * jax.lax.rsqrt(sq)[..., None]


def lerp(a, b, t):
    t = jnp.asarray(t)
    return a + (b - a) * t[..., None] if t.ndim == a.ndim - 1 else a + (b - a) * t


# ---------------------------------------------------------------------------
# quaternions — (x, y, z, w), same component order as reference core/math.h
# ---------------------------------------------------------------------------

QUAT_IDENTITY = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_identity(batch_shape=(), dtype=jnp.float32):
    q = jnp.zeros(tuple(batch_shape) + (4,), dtype)
    return q.at[..., 3].set(1.0)


def quat(x, y, z, w, dtype=jnp.float32):
    return jnp.stack(
        [jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype), jnp.asarray(w, dtype)],
        axis=-1,
    )


def quat_mul(a, b):
    """Hamilton product a*b (apply b's rotation, then a's)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q, eps: float = 1e-12):
    sq = jnp.maximum(jnp.sum(q * q, axis=-1), eps)
    return q * jax.lax.rsqrt(sq)[..., None]


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q: v' = v + 2*cross(q.xyz, cross(q.xyz, v) + w*v)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_from_axis_angle(axis, angle):
    """axis must be normalized; angle in radians."""
    angle = jnp.asarray(angle, dtype=jnp.float32)
    half = angle * 0.5
    s = jnp.sin(half)
    c = jnp.cos(half)
    return jnp.concatenate([axis * s[..., None], c[..., None]], axis=-1)


def quat_from_euler(pitch, yaw, roll):
    """Euler (pitch=X, yaw=Y, roll=Z) → quat, intrinsic Y·X·Z like the reference
    (core/math.cpp Quat::Quat(Vec3 euler))."""
    pitch = jnp.asarray(pitch, jnp.float32)
    yaw = jnp.asarray(yaw, jnp.float32)
    roll = jnp.asarray(roll, jnp.float32)
    qx = quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), pitch)
    qy = quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), yaw)
    qz = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), roll)
    return quat_mul(qy, quat_mul(qx, qz))


def quat_nlerp(a, b, t):
    """Normalized lerp with hemisphere correction (≙ reference nlerp, core/math.cpp) —
    the blend the reference uses for pose rotation blending (renderer/pose.cpp blend)."""
    t = jnp.asarray(t, dtype=a.dtype)
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(d < 0.0, -b, b)
    if t.ndim < a.ndim:
        t = t[..., None]
    return quat_normalize(a + (b - a) * t)


def quat_slerp(a, b, t):
    """Spherical lerp with nlerp fallback for nearly-parallel quats."""
    t = jnp.asarray(t, dtype=a.dtype)
    d = jnp.sum(a * b, axis=-1)
    b = jnp.where(d[..., None] < 0.0, -b, b)
    d = jnp.abs(d)
    d = jnp.minimum(d, 1.0 - 1e-7)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    if t.ndim < a.ndim - 1:
        t = jnp.broadcast_to(t, d.shape)
    wa = jnp.sin((1.0 - t) * theta) / sin_theta
    wb = jnp.sin(t * theta) / sin_theta
    use_slerp = d < 0.9995
    wa = jnp.where(use_slerp, wa, 1.0 - t)
    wb = jnp.where(use_slerp, wb, t)
    return quat_normalize(a * wa[..., None] + b * wb[..., None])


def quat_to_mat3(q):
    """Quaternion → 3x3 rotation matrix, shape [..., 3, 3]."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def mat3_to_quat(m):
    """3x3 rotation matrix [..., 3, 3] → quat (x,y,z,w). Branch-free Shepperd method."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate formulations; pick per-element the numerically largest pivot
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 0.5
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], -1) / (4.0 * qw0)[..., None]

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 0.5
    q1 = jnp.stack([4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], -1) / (4.0 * qx1)[..., None]

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 0.5
    q2 = jnp.stack([(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], -1) / (4.0 * qy2)[..., None]

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 0.5
    q3 = jnp.stack([(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], -1) / (4.0 * qz3)[..., None]

    cond0 = tr > 0.0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# dual quaternions — skinning palette format (≙ reference core/math.h DualQuat,
# built in renderer/pipeline.cpp computeSkeletonDualQuats)
# ---------------------------------------------------------------------------


def dual_quat_from_rigid(rot, pos):
    """(rot quat [...,4], pos [...,3]) → dual quat [..., 8] = (real, dual)."""
    real = rot
    pq = jnp.concatenate([pos, jnp.zeros(pos.shape[:-1] + (1,), pos.dtype)], axis=-1)
    dual = 0.5 * quat_mul(pq, real)
    return jnp.concatenate([real, dual], axis=-1)


def dual_quat_transform(dq, v):
    """Apply dual quaternion [..., 8] to points [..., 3]."""
    real = dq[..., :4]
    dual = dq[..., 4:]
    # translation = 2 * dual * conj(real)
    t = 2.0 * quat_mul(dual, quat_conjugate(real))[..., :3]
    return quat_rotate(real, v) + t


def dual_quat_normalize(dq):
    real = dq[..., :4]
    dual = dq[..., 4:]
    inv_len = jax.lax.rsqrt(jnp.maximum(jnp.sum(real * real, axis=-1, keepdims=True), 1e-12))
    return jnp.concatenate([real * inv_len, dual * inv_len], axis=-1)


# ---------------------------------------------------------------------------
# misc scalar helpers
# ---------------------------------------------------------------------------


def degrees_to_radians(d):
    return jnp.asarray(d) * (jnp.pi / 180.0)


def radians_to_degrees(r):
    return jnp.asarray(r) * (180.0 / jnp.pi)


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)
