"""Terrain (≙ reference renderer/terrain.{h,cpp}: heightmap terrain with LOD +
grass types).

TPU build: a terrain is a heightmap grid [H, W] with xz/y scales; the hot op is
batched bilinear height/normal sampling — used by rendering (LOD morphing
inputs), navigation (walkable slopes) and physics (heightfield contacts,
physics/module.py). Grass types are per-terrain distributions expanded into
instance transforms by a seeded device kernel (the reference scatters grass
quads per cell).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TerrainBank:
    """Stacked padded heightmaps; leading axis = terrain id."""

    heights: jnp.ndarray    # f32 [T, H, W]
    inv_xz: jnp.ndarray     # f32 [T] 1 / xz cell size
    y_scale: jnp.ndarray    # f32 [T]
    size: jnp.ndarray       # int32 [T, 2] (h, w) used


def sample_height(bank: TerrainBank, tid, x, z):
    """Bilinear heightmap sample in terrain-local space → y [..., K].
    x/z [..., K] local coordinates, tid scalar or [..., K]."""
    hm = bank.heights[tid] if np.ndim(tid) == 0 else jnp.take(bank.heights, tid, axis=0)
    inv = bank.inv_xz[tid]
    ys = bank.y_scale[tid]
    h = bank.size[tid, 0]
    w = bank.size[tid, 1]
    gx = jnp.clip(x * inv, 0.0, w.astype(jnp.float32) - 1.001)
    gz = jnp.clip(z * inv, 0.0, h.astype(jnp.float32) - 1.001)
    x0 = jnp.floor(gx).astype(jnp.int32)
    z0 = jnp.floor(gz).astype(jnp.int32)
    fx = gx - x0
    fz = gz - z0
    h00 = hm[z0, x0]
    h10 = hm[z0, x0 + 1]
    h01 = hm[z0 + 1, x0]
    h11 = hm[z0 + 1, x0 + 1]
    return ((h00 * (1 - fx) + h10 * fx) * (1 - fz)
            + (h01 * (1 - fx) + h11 * fx) * fz) * ys


def sample_normal(bank: TerrainBank, tid, x, z, eps: float = 0.5):
    """Central-difference surface normal [..., 3, K] (y-up)."""
    hl = sample_height(bank, tid, x - eps, z)
    hr = sample_height(bank, tid, x + eps, z)
    hd = sample_height(bank, tid, x, z - eps)
    hu = sample_height(bank, tid, x, z + eps)
    n = jnp.stack([hl - hr, jnp.full(jnp.shape(hl), 2.0 * eps), hd - hu], axis=-2)
    norm = jax.lax.rsqrt(jnp.maximum(jnp.sum(n * n, axis=-2, keepdims=True), 1e-12))
    return n * norm


def scatter_grass(bank: TerrainBank, tid: int, density: float, extent_xz,
                  key, max_instances: int = 4096, max_slope_y: float = 0.7):
    """Grass instance transforms (≙ Terrain grass types): seeded uniform
    scatter, snapped to the heightmap, masked by slope. → (pos [3, N],
    yaw [N], mask [N])."""
    kx, kz, ka = jax.random.split(key, 3)
    n = max_instances
    x = jax.random.uniform(kx, (n,)) * extent_xz[0]
    z = jax.random.uniform(kz, (n,)) * extent_xz[1]
    y = sample_height(bank, tid, x, z)
    nrm = sample_normal(bank, tid, x, z)
    yaw = jax.random.uniform(ka, (n,)) * (2 * np.pi)
    wanted = jnp.arange(n) < jnp.int32(density * extent_xz[0] * extent_xz[1])
    mask = (nrm[1] > max_slope_y) & wanted
    return jnp.stack([x, y, z], axis=-2), yaw, mask


class TerrainRegistry:
    """Host terrain store → baked TerrainBank."""

    def __init__(self):
        self.terrains: List[dict] = []
        self._bank: Optional[TerrainBank] = None

    def add(self, heights: np.ndarray, xz_scale: float = 1.0, y_scale: float = 1.0,
            grass_types: Optional[List[dict]] = None) -> int:
        self.terrains.append({
            "heights": np.asarray(heights, np.float32),
            "xz_scale": float(xz_scale),
            "y_scale": float(y_scale),
            "grass_types": grass_types or [],
        })
        self._bank = None
        return len(self.terrains) - 1

    def get(self, tid: int) -> dict:
        return self.terrains[tid]

    @property
    def bank(self) -> TerrainBank:
        if self._bank is None:
            t = max(len(self.terrains), 1)
            mh = max([2] + [tr["heights"].shape[0] for tr in self.terrains])
            mw = max([2] + [tr["heights"].shape[1] for tr in self.terrains])
            hs = np.zeros((t, mh, mw), np.float32)
            inv = np.ones(t, np.float32)
            ys = np.ones(t, np.float32)
            size = np.full((t, 2), 2, np.int32)
            for i, tr in enumerate(self.terrains):
                h, w = tr["heights"].shape
                hs[i, :h, :w] = tr["heights"]
                inv[i] = 1.0 / tr["xz_scale"]
                ys[i] = tr["y_scale"]
                size[i] = (h, w)
            self._bank = TerrainBank(
                heights=jnp.asarray(hs), inv_xz=jnp.asarray(inv),
                y_scale=jnp.asarray(ys), size=jnp.asarray(size),
            )
        return self._bank


def terrain_lod_levels(dist2, lod_distances):
    """Chunk LOD pick by camera distance (≙ terrain.cpp LOD selection) —
    same rule as model LODs."""
    return jnp.sum(dist2[..., None, :] > jnp.asarray(lod_distances)[..., :, None], axis=-2)
