"""SRT Transform pytree (≙ reference core/math.h Transform + docs/transform.md).

The reference stores a Transform explicitly as {DVec3 pos, Quat rot, Vec3 scale}
and *not* as a matrix (docs/transform.md) — compose/inverse are quaternion
algebra. We keep exactly that representation as a struct-of-arrays pytree in
the TPU layout (see core/math.py): ``pos [..., 3, N]``, ``rot [..., 4, N]``,
``scale [..., 3, N]`` — component axis -2, entity/lane axis -1.

compose semantics match reference core/math.cpp Transform::compose:
    out.pos   = a.pos + a.rot * (b.pos * a.scale)
    out.rot   = a.rot * b.rot
    out.scale = a.scale * b.scale
compute_local matches math.cpp computeLocal (the inverse operation). Note this
compose is NOT associative under non-uniform scale — evaluation is strictly
top-down (root → leaf), exactly like the reference's recursive transformEntity.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.core import math as lm

AXIS = -2  # component axis for all Transform math


@struct.dataclass
class Transform:
    """SoA SRT transform: pos [..., 3, N], rot quat(x,y,z,w) [..., 4, N],
    scale [..., 3, N]. N = entity/bone/instance lane axis."""

    pos: jnp.ndarray
    rot: jnp.ndarray
    scale: jnp.ndarray

    @staticmethod
    def identity(n: int, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> "Transform":
        bs = tuple(batch_shape)
        rot = jnp.zeros(bs + (4, n), dtype).at[..., 3, :].set(1.0)
        return Transform(
            pos=jnp.zeros(bs + (3, n), dtype),
            rot=rot,
            scale=jnp.ones(bs + (3, n), dtype),
        )

    @property
    def lanes(self) -> int:
        return self.pos.shape[-1]

    def packed(self) -> jnp.ndarray:
        """[..., 10, N] concatenation (pos|rot|scale) — one-gather form."""
        return jnp.concatenate([self.pos, self.rot, self.scale], axis=AXIS)

    @staticmethod
    def from_packed(p: jnp.ndarray) -> "Transform":
        comp = p.ndim + AXIS
        return Transform(
            pos=jax.lax.slice_in_dim(p, 0, 3, axis=comp),
            rot=jax.lax.slice_in_dim(p, 3, 7, axis=comp),
            scale=jax.lax.slice_in_dim(p, 7, 10, axis=comp),
        )


def compose(a: Transform, b: Transform) -> Transform:
    """a ∘ b — apply b in a's space (parent ∘ local = global)."""
    return Transform(
        pos=a.pos + lm.quat_rotate(a.rot, b.pos * a.scale, axis=AXIS),
        rot=lm.quat_mul(a.rot, b.rot, axis=AXIS),
        scale=a.scale * b.scale,
    )


def inverse(t: Transform) -> Transform:
    inv_rot = lm.quat_conjugate(t.rot, axis=AXIS)
    inv_scale = 1.0 / t.scale
    return Transform(
        pos=lm.quat_rotate(inv_rot, -t.pos, axis=AXIS) * inv_scale,
        rot=inv_rot,
        scale=inv_scale,
    )


def compute_local(parent: Transform, child_global: Transform) -> Transform:
    """Local l such that compose(parent, l) == child_global
    (≙ reference math.cpp Transform::computeLocal)."""
    inv_rot = lm.quat_conjugate(parent.rot, axis=AXIS)
    return Transform(
        pos=lm.quat_rotate(inv_rot, child_global.pos - parent.pos, axis=AXIS) / parent.scale,
        rot=lm.quat_mul(inv_rot, child_global.rot, axis=AXIS),
        scale=child_global.scale / parent.scale,
    )


def transform_point(t: Transform, p: jnp.ndarray) -> jnp.ndarray:
    return t.pos + lm.quat_rotate(t.rot, p * t.scale, axis=AXIS)


def transform_vector(t: Transform, v: jnp.ndarray) -> jnp.ndarray:
    return lm.quat_rotate(t.rot, v, axis=AXIS)


def take(t: Transform, idx: jnp.ndarray) -> Transform:
    """Gather along the entity/lane axis."""
    return Transform(
        pos=jnp.take(t.pos, idx, axis=-1),
        rot=jnp.take(t.rot, idx, axis=-1),
        scale=jnp.take(t.scale, idx, axis=-1),
    )


def where(mask: jnp.ndarray, a: Transform, b: Transform) -> Transform:
    """mask over lanes [..., N] selects a (true) or b."""
    m = jnp.expand_dims(mask, AXIS)
    return Transform(
        pos=jnp.where(m, a.pos, b.pos),
        rot=jnp.where(m, a.rot, b.rot),
        scale=jnp.where(m, a.scale, b.scale),
    )
