"""Clip sampling kernels (≙ reference animation.cpp getRelativePose).

Reference inner loop: per track, bit-unpack 2 frames and nlerp — a scalar loop
per bone per entity. TPU re-architecture: sampling a whole batch of animators
is ONE matmul on the MXU:

    pose[7·B, A] = clip_table[7·B, CF] @ weights[CF, A]

where weights is a "weighted two-hot" matrix: column a has (1-α)·w at the
clip-frame index of animator a's floor frame and α·w at the next frame (w =
the animator's blend weight; 0 columns = masked-out animators). Frame lerp,
clip selection, looping and blend weights all become column weights. Clip
quats are sign-coherent along time (baked), so lerp+normalize ≡ nlerp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def frame_weights(
    time_s: jnp.ndarray,        # f32 [A] current times (seconds)
    clip_ids: jnp.ndarray,      # int32 [A] clip per animator (data or constant)
    clip_offset,                # int32 [C] static
    clip_frames,                # int32 [C] static
    clip_fps,                   # f32 [C] static
    clip_length,                # f32 [C] static
    weight: jnp.ndarray | None = None,  # f32 [A] blend weights (None = 1)
    looping: bool = True,
):
    """→ (flat0 [A], flat1 [A], w0 [A], w1 [A]) — column indices into the clip
    table and their lerp weights."""
    cid = jnp.maximum(clip_ids, 0)
    off = jnp.asarray(clip_offset)[cid]
    nframes = jnp.asarray(clip_frames)[cid]
    fps = jnp.asarray(clip_fps)[cid]
    length = jnp.asarray(clip_length)[cid]
    t = jnp.where(looping, jnp.mod(time_s, length), jnp.clip(time_s, 0.0, length))
    ff = t * fps
    f0 = jnp.floor(ff).astype(jnp.int32)
    f0 = jnp.clip(f0, 0, nframes - 1)
    f1 = jnp.minimum(f0 + 1, nframes - 1)
    a = ff - f0.astype(jnp.float32)
    w = jnp.ones_like(t) if weight is None else weight
    valid = (clip_ids >= 0).astype(jnp.float32)
    w = w * valid
    return off + f0, off + f1, (1.0 - a) * w, a * w


def two_hot(flat0, flat1, w0, w1, num_cols: int) -> jnp.ndarray:
    """Build the weighted two-hot matrix [CF, A]."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (num_cols, flat0.shape[-1]), 0)
    m = jnp.where(cols == flat0[None, :], w0[None, :], 0.0)
    m = m + jnp.where(cols == flat1[None, :], w1[None, :], 0.0)
    return m


def sample_bank(table: jnp.ndarray, weights_cf_a: jnp.ndarray) -> jnp.ndarray:
    """pose [7·B?, A] = table [rows, CF] @ weights [CF, A] on the MXU.

    precision=HIGHEST keeps the f32 mantissa through the MXU (default TPU
    matmul quantizes inputs to bf16 — visible jitter on pose channels)."""
    return jnp.dot(
        table, weights_cf_a,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def sample_clips(
    table: jnp.ndarray,          # [7*B, CF]
    time_s: jnp.ndarray,         # [A]
    clip_ids: jnp.ndarray,       # [A]
    statics,                     # ClipBankStatics
    weight: jnp.ndarray | None = None,
    looping: bool = True,
    normalize_rot: bool = True,
):
    """→ (pos [3, B, A], rot [4, B, A]) local-space sampled pose.

    With `weight` given, the result is pre-scaled by weight (used by the blend
    stack where poses are accumulated)."""
    cf = table.shape[-1]
    f0, f1, w0, w1 = frame_weights(
        time_s, clip_ids, statics.clip_offset, statics.clip_frames,
        statics.clip_fps, statics.clip_length, weight=weight, looping=looping,
    )
    w = two_hot(f0, f1, w0, w1, cf)
    out = sample_bank(table, w)  # [7*B, A]
    b = table.shape[0] // 7
    out = out.reshape(out.shape[:-2] + (7, b, out.shape[-1]))
    pos = out[..., 0:3, :, :]
    rot = out[..., 3:7, :, :]
    if normalize_rot:
        norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(rot * rot, axis=-3, keepdims=True), 1e-12))
        rot = rot * norm
    return pos, rot


def sample_root_motion(root_table: jnp.ndarray, time_s, clip_ids, statics, looping=True):
    """Sample the per-clip root-motion delta track → (pos [3, A], rot [4, A]).
    The track stores root transform deltas vs frame 0 (≙ animation.cpp
    getRootMotion); the module differences consecutive samples to get
    per-frame root motion."""
    cf = root_table.shape[-1]
    f0, f1, w0, w1 = frame_weights(
        time_s, clip_ids, statics.clip_offset, statics.clip_frames,
        statics.clip_fps, statics.clip_length, looping=looping,
    )
    w = two_hot(f0, f1, w0, w1, cf)
    out = sample_bank(root_table, w)  # [7, A]
    pos = out[..., 0:3, :]
    rot = out[..., 3:7, :]
    norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(rot * rot, axis=-2, keepdims=True), 1e-12))
    return pos, rot * norm
