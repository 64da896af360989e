"""Batched vector/quaternion math (≙ reference src/core/math.{h,cpp}, simd_math.h).

TPU layout rule — **component axis major, entity axis minor**. Large batched
arrays are stored struct-of-arrays with the entity/lane axis LAST: vectors are
``[..., 3, N]``, quaternions ``[..., 4, N]`` in (x, y, z, w) component order
(same order as the reference's Quat). XLA tiles the minor axis across the
VPU's 128 lanes; a trailing component axis of 3 or 4 would be padded to 128
(42x memory waste — measured 10x step slowdown and 50-450x compile blowup).
This mirrors the reference's own SoA SSE layout (core/simd_math.h): xxxx yyyy
zzzz across lanes, not xyzw per slot.

Every function takes ``axis=`` for the component axis: -1 for small host-ish
values (a camera quat of shape [4]), -2 for the big SoA arrays. Internally all
math is done on *unstacked* component rows (slices along the component axis are
contiguous [N] rows — no transposes are materialized; XLA fuses everything).

Positions are float32. The reference stores world positions as doubles (DVec3)
for planetary scale; TPUs have no fast f64, so this engine adopts the
reference's own camera-relative trick (ShiftedFrustum, core/geometry.h) at the
world level: per-world f32 coordinates with an optional f64 origin host-side.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def unstack(a, axis: int = -1):
    """Split along `axis` into component rows (views, no copies after fusion)."""
    a = jnp.asarray(a)
    return tuple(jnp.moveaxis(a, axis, 0))


def stack(components, axis: int = -1):
    return jnp.stack(components, axis=axis)


# ---------------------------------------------------------------------------
# vectors
# ---------------------------------------------------------------------------


def vec3(x, y, z, dtype=jnp.float32, axis: int = -1):
    return jnp.stack(
        [jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)], axis=axis
    )


def dot(a, b, axis: int = -1):
    return jnp.sum(a * b, axis=axis)


def cross(a, b, axis: int = -1):
    ax, ay, az = unstack(a, axis)
    bx, by, bz = unstack(b, axis)
    return jnp.stack([ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=axis)


def length(v, axis: int = -1):
    return jnp.sqrt(jnp.maximum(dot(v, v, axis), 0.0))


def squared_length(v, axis: int = -1):
    return dot(v, v, axis)


def normalize(v, axis: int = -1, eps: float = 1e-12):
    """Safe normalize: v * rsqrt(|v|^2); zero vectors stay finite."""
    sq = jnp.maximum(dot(v, v, axis), eps)
    return v * jnp.expand_dims(jax.lax.rsqrt(sq), axis)


def lerp(a, b, t):
    return a + (b - a) * t


# ---------------------------------------------------------------------------
# quaternions — component order (x, y, z, w), like reference core/math.h
# ---------------------------------------------------------------------------

QUAT_IDENTITY = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_identity(batch_shape=(), dtype=jnp.float32, axis: int = -1):
    shape = tuple(batch_shape)
    if axis == -1:
        q = jnp.zeros(shape + (4,), dtype)
        return q.at[..., 3].set(1.0)
    # axis == -2 SoA form: [..., 4, N] needs an N; caller uses broadcast instead
    raise ValueError("quat_identity only supports axis=-1; broadcast QUAT_IDENTITY for SoA")


def quat(x, y, z, w, dtype=jnp.float32, axis: int = -1):
    return jnp.stack(
        [jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype), jnp.asarray(w, dtype)],
        axis=axis,
    )


def _quat_mul_parts(a, b, axis):
    ax, ay, az, aw = unstack(a, axis)
    bx, by, bz, bw = unstack(b, axis)
    return (
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    )


def quat_mul(a, b, axis: int = -1):
    """Hamilton product a*b (apply b's rotation, then a's)."""
    return jnp.stack(_quat_mul_parts(a, b, axis), axis=axis)


def quat_conjugate(q, axis: int = -1):
    x, y, z, w = unstack(q, axis)
    return jnp.stack([-x, -y, -z, w], axis=axis)


def quat_normalize(q, axis: int = -1, eps: float = 1e-12):
    sq = jnp.maximum(jnp.sum(q * q, axis=axis), eps)
    return q * jnp.expand_dims(jax.lax.rsqrt(sq), axis)


def quat_rotate(q, v, axis: int = -1):
    """Rotate vector(s) v by quaternion(s) q: v + 2*(w*(q×v) + q×(q×v))."""
    qx, qy, qz, qw = unstack(q, axis)
    vx, vy, vz = unstack(v, axis)
    # t = 2 * cross(q.xyz, v)
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    # v' = v + w*t + cross(q.xyz, t)
    ox = vx + qw * tx + (qy * tz - qz * ty)
    oy = vy + qw * ty + (qz * tx - qx * tz)
    oz = vz + qw * tz + (qx * ty - qy * tx)
    return jnp.stack([ox, oy, oz], axis=axis)


def quat_from_axis_angle(axis_v, angle, axis: int = -1):
    """axis_v must be normalized; angle in radians."""
    angle = jnp.asarray(angle, dtype=jnp.float32)
    half = angle * 0.5
    s = jnp.sin(half)
    c = jnp.cos(half)
    x, y, z = unstack(axis_v, axis)
    return jnp.stack([x * s, y * s, z * s, c], axis=axis)


def quat_from_euler(pitch, yaw, roll):
    """Euler (pitch=X, yaw=Y, roll=Z) → quat, intrinsic Y·X·Z like the reference."""
    qx = quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.asarray(pitch, jnp.float32))
    qy = quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.asarray(yaw, jnp.float32))
    qz = quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.asarray(roll, jnp.float32))
    return quat_mul(qy, quat_mul(qx, qz))


def quat_nlerp(a, b, t, axis: int = -1):
    """Normalized lerp with hemisphere correction (≙ reference nlerp) — the
    blend used for pose rotation blending (renderer/pose.cpp blend)."""
    t = jnp.asarray(t, dtype=jnp.float32)
    d = jnp.sum(a * b, axis=axis, keepdims=True)
    b = jnp.where(d < 0.0, -b, b)
    if jnp.ndim(t) == jnp.ndim(a) - 1:
        t = jnp.expand_dims(t, axis)
    return quat_normalize(a + (b - a) * t, axis)


def quat_slerp(a, b, t, axis: int = -1):
    """Spherical lerp with nlerp fallback for nearly-parallel quats."""
    t = jnp.asarray(t, dtype=jnp.float32)
    d = jnp.sum(a * b, axis=axis)
    b = jnp.where(jnp.expand_dims(d, axis) < 0.0, -b, b)
    d = jnp.minimum(jnp.abs(d), 1.0 - 1e-7)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    tb = jnp.broadcast_to(t, d.shape)
    wa = jnp.sin((1.0 - tb) * theta) / sin_theta
    wb = jnp.sin(tb * theta) / sin_theta
    use_slerp = d < 0.9995
    wa = jnp.where(use_slerp, wa, 1.0 - tb)
    wb = jnp.where(use_slerp, wb, tb)
    return quat_normalize(
        a * jnp.expand_dims(wa, axis) + b * jnp.expand_dims(wb, axis), axis
    )


def quat_to_mat3(q, axis: int = -1):
    """Quaternion → 3x3 rotation matrix, shape [..., 3, 3] (row-major, applied
    to column vectors). Only axis=-1 quats (small data)."""
    x, y, z, w = unstack(q, axis)
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
    """3x3 rotation matrix [..., 3, 3] → quat (x,y,z,w). Branch-free Shepperd."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

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


def dual_quat_from_rigid(rot, pos, axis: int = -1):
    """(rot [..,4,..], pos [..,3,..]) → dual quat [..., 8, ...] = (real | dual)."""
    px, py, pz = unstack(pos, axis)
    zero = jnp.zeros_like(px)
    pq = jnp.stack([px, py, pz, zero], axis=axis)
    dual = 0.5 * quat_mul(pq, rot, axis)
    return jnp.concatenate([rot, dual], axis=axis if axis >= 0 else jnp.ndim(rot) + axis)


def _split_dq(dq, axis):
    comp_axis = axis if axis >= 0 else jnp.ndim(dq) + axis
    real = jax.lax.slice_in_dim(dq, 0, 4, axis=comp_axis)
    dual = jax.lax.slice_in_dim(dq, 4, 8, axis=comp_axis)
    return real, dual


def dual_quat_transform(dq, v, axis: int = -1):
    """Apply dual quaternion [..., 8, ...] to points [..., 3, ...]."""
    real, dual = _split_dq(dq, axis)
    t = quat_mul(dual, quat_conjugate(real, axis), axis)
    tx, ty, tz, _ = unstack(t, axis)
    trans = jnp.stack([2.0 * tx, 2.0 * ty, 2.0 * tz], axis=axis)
    return quat_rotate(real, v, axis) + trans


def dual_quat_normalize(dq, axis: int = -1):
    real, dual = _split_dq(dq, axis)
    inv_len = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(real * real, axis=axis, keepdims=True), 1e-12)
    )
    return jnp.concatenate(
        [real * inv_len, dual * inv_len],
        axis=axis if axis >= 0 else jnp.ndim(dq) + axis,
    )


# ---------------------------------------------------------------------------
# misc scalar helpers
# ---------------------------------------------------------------------------


def degrees_to_radians(d):
    return jnp.asarray(d) * (jnp.pi / 180.0)


def radians_to_degrees(r):
    return jnp.asarray(r) * (180.0 / jnp.pi)


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)
