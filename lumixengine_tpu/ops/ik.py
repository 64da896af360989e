"""FABRIK inverse kinematics (≙ reference animation/controller.cpp IK:
FABRIK, 5 iterations, chains ≤ 32 bones, alpha-blended into the pose).

TPU form: the whole animator batch solves at once. Chain joint positions are
[..., 3, L, A] (L = chain length); bone lengths are static. Each FABRIK
iteration = one backward + one forward pass over the chain — lax.fori_loop
over iterations, Python loop over the (short, static) chain.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lumixengine_tpu.core import math as lm

MAX_CHAIN = 32  # ≙ reference controller.cpp IK chain cap
DEFAULT_ITERATIONS = 5


def _norm_dir(v, eps=1e-9):
    n = jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, axis=-2, keepdims=True), eps))
    return v * n


def fabrik(
    joints: jnp.ndarray,       # [..., 3, L, A] chain joint positions (model space)
    target: jnp.ndarray,       # [..., 3, A]
    iterations: int = DEFAULT_ITERATIONS,
):
    """Solve chain positions toward target, root fixed. Returns [..., 3, L, A].

    Unreachable targets degrade gracefully (chain stretches toward target),
    matching FABRIK's standard behavior and the reference's usage.
    """
    L = joints.shape[-2]
    root = joints[..., :, 0, :]
    # static bone lengths from the input chain
    seg = joints[..., :, 1:, :] - joints[..., :, :-1, :]
    lengths = jnp.sqrt(jnp.maximum(jnp.sum(seg * seg, axis=-3, keepdims=True), 1e-12))  # [...,1,L-1,A]

    def one_iter(_, p):
        # backward: end -> root, end pinned to target
        p = p.at[..., :, L - 1, :].set(target)
        for i in range(L - 2, -1, -1):
            d = _norm_dir(p[..., :, i, :] - p[..., :, i + 1, :])
            p = p.at[..., :, i, :].set(p[..., :, i + 1, :] + d * lengths[..., :, i, :])
        # forward: root -> end, root pinned
        p = p.at[..., :, 0, :].set(root)
        for i in range(1, L):
            d = _norm_dir(p[..., :, i, :] - p[..., :, i - 1, :])
            p = p.at[..., :, i, :].set(p[..., :, i - 1, :] + d * lengths[..., :, i - 1, :])
        return p

    return jax.lax.fori_loop(0, iterations, one_iter, joints)


def chain_rotation_deltas(old_joints: jnp.ndarray, new_joints: jnp.ndarray):
    """Per-joint world-space rotation deltas aligning old bone directions to
    the solved ones → quats [..., 4, L-1, A] (applied to the pose's absolute
    rotations, then alpha-blended like the reference)."""
    d_old = _norm_dir(old_joints[..., :, 1:, :] - old_joints[..., :, :-1, :])
    d_new = _norm_dir(new_joints[..., :, 1:, :] - new_joints[..., :, :-1, :])
    # shortest-arc quaternion between two unit vectors
    c = lm.cross(d_old, d_new, axis=-3)
    d = jnp.sum(d_old * d_new, axis=-3, keepdims=True)
    w = 1.0 + d
    q = jnp.concatenate([c, w], axis=-3)
    # degenerate opposite vectors: fall back to a perpendicular axis
    opp = w < 1e-6
    perp = _norm_dir(lm.cross(d_old, jnp.ones_like(d_old) * jnp.asarray([1.0, 0.3, 0.7])[:, None, None], axis=-3))
    q_opp = jnp.concatenate([perp, jnp.zeros_like(w)], axis=-3)
    q = jnp.where(opp, q_opp, q)
    return lm.quat_normalize(q, axis=-3)


def apply_ik(
    joints: jnp.ndarray,   # [..., 3, L, A] current chain (model space)
    target: jnp.ndarray,   # [..., 3, A]
    alpha,                 # scalar or [..., A]
    iterations: int = DEFAULT_ITERATIONS,
):
    """FABRIK + alpha blend toward the solution (≙ controller.cpp IK alpha)."""
    solved = fabrik(joints, target, iterations)
    a = jnp.asarray(alpha, jnp.float32)
    if a.ndim == joints.ndim - 2:  # per-animator alpha [..., A]
        a = jnp.expand_dims(jnp.expand_dims(a, -2), -2)
    return joints + (solved - joints) * a
