"""Frustum culling kernels (≙ reference renderer/culling_system.cpp doCulling).

Reference inner loop: SIMD sphere-vs-frustum, 4 planes per SSE op, over SoA
sphere pages, parallelized with jobs::forEach over 300 m grid cells with
whole-cell accept/reject fast paths. TPU re-architecture: the grid disappears —
a dense lane-parallel test over ALL spheres is a handful of fused VPU ops and,
unlike the CPU version, has no branch/indirection cost; at 10k-1M spheres the
brute-force pass is bandwidth-bound and beats gather-heavy cell logic.

Two implementations:
  * `frustum_cull_jnp` — fused-by-XLA elementwise version (also the reference
    semantics oracle for tests).
  * `frustum_cull_pallas` — Pallas kernel, spheres tiled (8,128) over the VPU,
    all 8 (padded) planes tested per tile; used on TPU where it skips the
    intermediate [N,8] distance materialization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lumixengine_tpu.core.geometry import Frustum, frustum_sphere_visible

_LANES = 128
_SUBLANES = 8
_TILE = _LANES * _SUBLANES  # 1024 spheres per grid step


def frustum_cull_jnp(centers: jnp.ndarray, radii: jnp.ndarray, frustum: Frustum) -> jnp.ndarray:
    """SoA centers [3,N], radii [N] → visible bool [N]."""
    return frustum_sphere_visible(frustum, centers, radii)


def _cull_kernel(planes_ref, x_ref, y_ref, z_ref, r_ref, out_ref):
    x = x_ref[:]
    y = y_ref[:]
    z = z_ref[:]
    r = r_ref[:]
    acc = jnp.full(x.shape, jnp.inf, jnp.float32)
    for p in range(6):  # static unroll; planes 6,7 are always-pass padding
        px = planes_ref[p, 0]
        py = planes_ref[p, 1]
        pz = planes_ref[p, 2]
        pd = planes_ref[p, 3]
        acc = jnp.minimum(acc, x * px + y * py + z * pz + pd)
    out_ref[:] = acc >= -r


@functools.partial(jax.jit, static_argnames=("interpret",))
def frustum_cull_pallas(centers, radii, frustum: Frustum, interpret: bool = False):
    """Pallas path. SoA centers [3,N], radii [N] → bool [N]. N is padded to
    1024 internally; padding spheres are culled out by the caller's alive
    mask. Component rows are already contiguous lanes — no transposes."""
    n = centers.shape[-1]
    n_pad = ((n + _TILE - 1) // _TILE) * _TILE
    pad = n_pad - n
    x = jnp.pad(centers[0], (0, pad)).reshape(-1, _LANES)
    y = jnp.pad(centers[1], (0, pad)).reshape(-1, _LANES)
    z = jnp.pad(centers[2], (0, pad)).reshape(-1, _LANES)
    r = jnp.pad(radii, (0, pad)).reshape(-1, _LANES)
    rows = x.shape[0]
    planes = frustum.planes.astype(jnp.float32)  # (8, 4)

    grid = (rows // _SUBLANES,)
    block = (_SUBLANES, _LANES)
    out = pl.pallas_call(
        _cull_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.bool_),
        interpret=interpret,
    )(planes, x, y, z, r)
    return out.reshape(-1)[:n]


def frustum_cull(centers, radii, frustum: Frustum, use_pallas: bool | None = None):
    """Dispatch: Pallas on TPU, jnp elsewhere (tests run the jnp oracle; the
    Pallas kernel has its own parity test in interpret mode)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return frustum_cull_pallas(centers, radii, frustum)
    return frustum_cull_jnp(centers, radii, frustum)
