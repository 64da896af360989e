"""SRT Transform pytree (≙ reference core/math.h Transform + docs/transform.md).

The reference stores a Transform explicitly as {DVec3 pos, Quat rot, Vec3 scale}
and *not* as a matrix (math.h, docs/transform.md) — compose/inverse are quaternion
algebra. We keep exactly that representation, as a struct-of-arrays pytree so a
whole World's transforms are three dense arrays the VPU can chew through.

compose semantics match reference core/math.cpp Transform::compose:
    out.pos   = a.pos + a.rot * (b.pos * a.scale)
    out.rot   = a.rot * b.rot
    out.scale = a.scale * b.scale
compute_local matches math.cpp computeLocal (the inverse operation).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.core import math as lm


@struct.dataclass
class Transform:
    """Batched SRT transform: pos [..., 3], rot quat(x,y,z,w) [..., 4], scale [..., 3]."""

    pos: jnp.ndarray
    rot: jnp.ndarray
    scale: jnp.ndarray

    @staticmethod
    def identity(batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> "Transform":
        bs = tuple(batch_shape)
        return Transform(
            pos=jnp.zeros(bs + (3,), dtype),
            rot=lm.quat_identity(bs, dtype),
            scale=jnp.ones(bs + (3,), dtype),
        )

    @property
    def batch_shape(self):
        return self.pos.shape[:-1]


def compose(a: Transform, b: Transform) -> Transform:
    """a ∘ b — apply b in a's space (parent ∘ local = global)."""
    return Transform(
        pos=a.pos + lm.quat_rotate(a.rot, b.pos * a.scale),
        rot=lm.quat_mul(a.rot, b.rot),
        scale=a.scale * b.scale,
    )


def inverse(t: Transform) -> Transform:
    inv_rot = lm.quat_conjugate(t.rot)
    inv_scale = 1.0 / t.scale
    return Transform(
        pos=lm.quat_rotate(inv_rot, -t.pos) * inv_scale,
        rot=inv_rot,
        scale=inv_scale,
    )


def compute_local(parent: Transform, child_global: Transform) -> Transform:
    """Local transform l such that compose(parent, l) == child_global
    (≙ reference math.cpp Transform::computeLocal)."""
    inv_rot = lm.quat_conjugate(parent.rot)
    return Transform(
        pos=lm.quat_rotate(inv_rot, child_global.pos - parent.pos) / parent.scale,
        rot=lm.quat_mul(inv_rot, child_global.rot),
        scale=child_global.scale / parent.scale,
    )


def transform_point(t: Transform, p: jnp.ndarray) -> jnp.ndarray:
    return t.pos + lm.quat_rotate(t.rot, p * t.scale)


def transform_vector(t: Transform, v: jnp.ndarray) -> jnp.ndarray:
    return lm.quat_rotate(t.rot, v)


def gather(t: Transform, idx: jnp.ndarray, mode: str = "clip") -> Transform:
    """Index a batched transform along its leading axis."""
    return Transform(
        pos=t.pos.at[idx].get(mode=mode),
        rot=t.rot.at[idx].get(mode=mode),
        scale=t.scale.at[idx].get(mode=mode),
    )


def where(mask: jnp.ndarray, a: Transform, b: Transform) -> Transform:
    m = mask[..., None]
    return Transform(
        pos=jnp.where(m, a.pos, b.pos),
        rot=jnp.where(m, a.rot, b.rot),
        scale=jnp.where(m, a.scale, b.scale),
    )
