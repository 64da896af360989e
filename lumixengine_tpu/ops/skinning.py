"""Skinning palette + vertex skinning (≙ reference renderer/pipeline.cpp
computeSkeletonDualQuats and the skinning shaders).

Reference: per skinned instance, absolute pose × inverse bind → dual-quaternion
palette uploaded to a transient GPU buffer; vertex shaders blend ≤4 bone dual
quats (DQS). TPU: palettes for a whole animator batch are built in one fused
elementwise pass over [8, B, A]; vertex skinning (when the engine itself needs
skinned positions — cloth anchors, attachment points, CPU-side queries) is an
MXU matmul with the static bone-weight matrix: blended_dq[8, V, A] =
palette[8, B, A] ⊗ weights[B, V].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lumixengine_tpu.core import math as lm

AX = -3  # component axis for [C, B, A] pose tensors


def build_palette_dq(abs_pos, abs_rot, inv_bind_pos, inv_bind_rot):
    """Dual-quat palette [..., 8, B, A] from absolute pose [..., 3/4, B, A]
    and the model's inverse bind pose [3/4, B] (static, broadcast over A).

    palette = abs_pose ∘ inverse_bind (rigid compose), as dual quaternions —
    ≙ pipeline.cpp computeSkeletonDualQuats.
    """
    ibp = inv_bind_pos if inv_bind_pos.ndim >= abs_pos.ndim else inv_bind_pos[..., None]
    ibr = inv_bind_rot if inv_bind_rot.ndim >= abs_rot.ndim else inv_bind_rot[..., None]
    pos = abs_pos + lm.quat_rotate(abs_rot, ibp, axis=AX)
    rot = lm.quat_mul(abs_rot, ibr, axis=AX)
    return lm.dual_quat_from_rigid(rot, pos, axis=AX)


def blend_palette(palette_dq: jnp.ndarray, weights_bv) -> jnp.ndarray:
    """DQS weight blend on the MXU: [.., 8, B, A] ⊗ [B, V] → [.., 8, V, A].
    weights_bv is the static per-model vertex weight matrix (≤4 nonzero per
    column). Sign-coherence is handled by flipping against the first bone's
    real part, then the blended dq is normalized (standard DQS)."""
    w = jnp.asarray(weights_bv, palette_dq.dtype)  # [B, V]
    # hemisphere: flip each bone dq against bone 0's real quat per animator
    ref = palette_dq[..., :4, 0:1, :]
    d = jnp.sum(palette_dq[..., :4, :, :] * ref, axis=-3, keepdims=True)
    pal = jnp.where(d < 0.0, -palette_dq, palette_dq)
    blended = jnp.einsum("...cba,bv->...cva", pal, w, preferred_element_type=jnp.float32)
    return lm.dual_quat_normalize(blended, axis=AX)


def skin_points(blended_dq: jnp.ndarray, rest_points) -> jnp.ndarray:
    """Apply blended dual quats [.., 8, V, A] to rest positions [3, V] (static)
    → skinned positions [.., 3, V, A]."""
    p = jnp.asarray(rest_points)
    if p.ndim < blended_dq.ndim:
        p = p[..., None]
    return lm.dual_quat_transform(blended_dq, p, axis=AX)


def weights_matrix(vertex_bones: np.ndarray, vertex_weights: np.ndarray, num_bones: int) -> np.ndarray:
    """Static [B, V] weight matrix from per-vertex (≤4 bones, weights)."""
    vb = np.asarray(vertex_bones, np.int64)
    vw = np.asarray(vertex_weights, np.float32)
    v = vb.shape[0]
    m = np.zeros((num_bones, v), np.float32)
    for k in range(vb.shape[1]):
        m[vb[:, k], np.arange(v)] += vw[:, k]
    return m
