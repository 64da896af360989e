"""Pose kernels (≙ reference renderer/pose.{h,cpp}).

A reference Pose is SoA positions+rotations per bone, relative or absolute
(pose.h); computeAbsolute walks bone chains with 4-wide SIMD batches
(pose.cpp computeAbsolute), blend is lerp pos + nlerp rot (pose.cpp blend).

TPU layout: a batch of poses is pos [..., 3, B, A], rot [..., 4, B, A] —
channels major, bones middle, animator lanes minor. Absolute compose is a
level scan over the skeleton's depth levels (static per-model bone plan,
shared by every animator in the model group); each level is one static row
gather + rigid compose over all lanes. Bones are rigid (no scale), matching
the reference Pose.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BonePlan:
    """Static per-skeleton schedule: [(child_rows np[K], parent_rows np[K])]
    per depth level (roots excluded)."""

    def __init__(self, bone_parent: np.ndarray):
        bone_parent = np.asarray(bone_parent, np.int32)
        b = bone_parent.shape[0]
        level = np.zeros(b, np.int32)
        for i in range(b):
            p = bone_parent[i]
            level[i] = 0 if p < 0 else level[p] + 1
        self.levels: List[Tuple[np.ndarray, np.ndarray]] = []
        for d in range(1, int(level.max(initial=0)) + 1):
            idx = np.nonzero(level == d)[0].astype(np.int32)
            self.levels.append((idx, bone_parent[idx]))
        self.bone_level = level


def _rigid_compose(ppos, prot, lpos, lrot):
    """(R1,p1) ∘ (R2,p2) = (R1·R2, p1 + R1·p2), SoA over [..., C, K, A]."""
    from lumixengine_tpu.core import math as lm

    return (
        ppos + lm.quat_rotate(prot, lpos, axis=-3),
        lm.quat_mul(prot, lrot, axis=-3),
    )


def compute_absolute(pos: jnp.ndarray, rot: jnp.ndarray, plan: BonePlan):
    """Relative (local per bone) → absolute (model space) pose
    (≙ pose.cpp computeAbsolute). pos [..., 3, B, A], rot [..., 4, B, A]."""
    apos, arot = pos, rot
    for child_rows, parent_rows in plan.levels:
        ci = jnp.asarray(child_rows)
        pi = jnp.asarray(parent_rows)
        ppos = jnp.take(apos, pi, axis=-2)
        prot = jnp.take(arot, pi, axis=-2)
        lpos = jnp.take(pos, ci, axis=-2)
        lrot = jnp.take(rot, ci, axis=-2)
        npos, nrot = _rigid_compose(ppos, prot, lpos, lrot)
        apos = apos.at[..., ci, :].set(npos)
        arot = arot.at[..., ci, :].set(nrot)
    return apos, arot


def blend(pos_a, rot_a, pos_b, rot_b, t):
    """Pose blend: lerp positions + nlerp rotations (≙ pose.cpp blend).
    t: scalar or [..., A] per-animator weight."""
    t = jnp.asarray(t, jnp.float32)
    if t.ndim == pos_a.ndim - 2:
        # per-animator weight [..., A] → broadcast over channel+bone axes
        t = jnp.expand_dims(jnp.expand_dims(t, -2), -2)
    pos = pos_a + (pos_b - pos_a) * t
    d = jnp.sum(rot_a * rot_b, axis=-3, keepdims=True)
    rot_b = jnp.where(d < 0.0, -rot_b, rot_b)
    rot = rot_a + (rot_b - rot_a) * t
    norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(rot * rot, axis=-3, keepdims=True), 1e-12))
    return pos, rot * norm


def masked_blend(pos_a, rot_a, pos_b, rot_b, t, bone_mask):
    """Blend with a per-bone mask [B] (≙ reference BoneMask layers):
    masked-out bones keep pose A."""
    pos, rot = blend(pos_a, rot_a, pos_b, rot_b, t)
    m = jnp.asarray(bone_mask, bool)[..., :, None]
    return (
        jnp.where(m, pos, pos_a),
        jnp.where(m, rot, rot_a),
    )
