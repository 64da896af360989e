"""Clustered-shading light assignment (≙ reference renderer/pipeline.cpp
fillClusters — view-frustum clusters binned in x/y tiles and exponential z
slices, each holding the point lights that touch it; uploaded for per-pixel
shading).

TPU re-architecture: the cluster×light assignment is ONE dense [C, L]
sphere-vs-AABB test (C = nx·ny·nz clusters, L = point-light capacity) followed
by a top-k compaction to a fixed per-cluster light budget — no atomics, no
per-cluster loops (the reference's CPU path iterates lights and scatters into
cluster lists).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.core import math as lm

GRID = (16, 8, 24)          # x tiles, y tiles, z slices (≙ reference scale)
MAX_LIGHTS_PER_CLUSTER = 8


@struct.dataclass
class ClusterLights:
    lights: jnp.ndarray   # int32 [C, MAX] light slots, -1 padded
    count: jnp.ndarray    # int32 [C]
    overflow: jnp.ndarray  # int32 [] lights dropped by the per-cluster budget


def _cluster_bounds(near, far, fov_y, aspect,
                    grid: Tuple[int, int, int]):
    """View-space AABBs of every cluster → (mins [C,3], maxs [C,3]).
    Camera looks down -Z; z slices are exponential (standard clustered
    shading; matches the reference's depth slicing)."""
    nx, ny, nz = grid
    i = jnp.arange(nz + 1, dtype=jnp.float32) / nz
    zs = near * (far / near) ** i                      # [nz+1] positive depths
    th = jnp.tan(fov_y * 0.5)

    # per-slice half extents at the FAR plane of the slice (conservative)
    z0 = zs[:-1]
    z1 = zs[1:]
    hy1 = th * z1
    hx1 = hy1 * aspect

    xi = jnp.arange(nx, dtype=jnp.float32)
    yi = jnp.arange(ny, dtype=jnp.float32)
    # tile edges in [-1, 1]
    ex0 = 2.0 * xi / nx - 1.0
    ex1 = 2.0 * (xi + 1.0) / nx - 1.0
    ey0 = 2.0 * yi / ny - 1.0
    ey1 = 2.0 * (yi + 1.0) / ny - 1.0

    # broadcast to [nz, ny, nx]
    def b(a, shape_axis):
        sh = [1, 1, 1]
        sh[shape_axis] = -1
        return a.reshape(sh)

    x0 = jnp.minimum(b(ex0, 2) * b(hx1, 0), b(ex0, 2) * b(th * z0 * aspect, 0))
    x1 = jnp.maximum(b(ex1, 2) * b(hx1, 0), b(ex1, 2) * b(th * z0 * aspect, 0))
    y0 = jnp.minimum(b(ey0, 1) * b(hy1, 0), b(ey0, 1) * b(th * z0, 0))
    y1 = jnp.maximum(b(ey1, 1) * b(hy1, 0), b(ey1, 1) * b(th * z0, 0))
    z_min = -b(z1, 0)                                  # view space: -far side
    z_max = -b(z0, 0)
    full = jnp.zeros((nz, ny, nx))
    mins = jnp.stack([x0 + full, y0 + full, z_min + full], axis=-1).reshape(-1, 3)
    maxs = jnp.stack([x1 + full, y1 + full, z_max + full], axis=-1).reshape(-1, 3)
    return mins, maxs


def fill_clusters(ws, module, cam_slot: int = 0, statics=None,
                  grid: Tuple[int, int, int] = GRID,
                  max_per_cluster: int = MAX_LIGHTS_PER_CLUSTER) -> ClusterLights:
    """Assign every point light to the clusters its range-sphere touches."""
    from lumixengine_tpu.renderer.pipeline import resolve_cam_slot

    statics = statics or module.statics()
    rs = ws.modules[module.name]
    cam_slot = resolve_cam_slot(statics, cam_slot)
    cam_e = max(int(statics.cam_slots[cam_slot]), 0)
    cpos = ws.world.pos[..., :, cam_e]
    crot = ws.world.rot[..., :, cam_e]

    mins, maxs = _cluster_bounds(rs.cam_near[cam_slot],
                                 rs.cam_far[cam_slot],
                                 rs.cam_fov[cam_slot],
                                 rs.cam_aspect[cam_slot], grid)

    le = jnp.asarray(np.maximum(statics.pl_slots, 0))
    lw = jnp.take(ws.world.pos, le, axis=-1)            # [3, L] world
    # world → view space
    inv = lm.quat_conjugate(crot)
    lv = lm.quat_rotate(inv[..., :, None], lw - cpos[..., :, None], axis=-2)
    lv = jnp.moveaxis(lv, -2, -1)                       # [L, 3]
    rng = rs.pl_range                                   # [L]
    mask = jnp.asarray(statics.pl_mask)

    # sphere vs AABB: clamp center into the box, compare distance to range
    c = jnp.clip(lv[None, :, :], mins[:, None, :], maxs[:, None, :])  # [C,L,3]
    d2 = jnp.sum((c - lv[None, :, :]) ** 2, axis=-1)                   # [C,L]
    touch = (d2 <= (rng * rng)[None, :]) & mask[None, :]

    # compact to a fixed per-cluster budget, lowest light slot first
    L = touch.shape[-1]
    prio = jnp.where(touch, L - jnp.arange(L), 0)
    top_v, top_i = jax.lax.top_k(prio, min(max_per_cluster, L))
    lights = jnp.where(top_v > 0, top_i, -1).astype(jnp.int32)
    count = jnp.sum(touch, axis=-1).astype(jnp.int32)
    overflow = jnp.sum(jnp.maximum(count - max_per_cluster, 0)).astype(jnp.int32)
    return ClusterLights(lights=lights,
                         count=jnp.minimum(count, max_per_cluster),
                         overflow=overflow)
