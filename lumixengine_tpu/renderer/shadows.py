"""Shadow cascade data pass (≙ reference renderer/pipeline.cpp
Pipeline::renderShadows — 4 cascaded shadow maps for the Environment's
directional light: per-cascade camera-frustum slice, ortho light frustum fit,
caster culling, light-space matrices).

TPU re-architecture: all 4 cascades are computed in one batched pass — slice
corners [4, 8, 3], bounding spheres, ortho frusta and [4, K] caster masks as
stacked arrays. The GPU-side rasterization stays behind the DrawStream
boundary; this pass produces exactly the data the reference uploads (cascade
view-proj matrices + per-cascade visible caster sets).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.core import geometry as geom
from lumixengine_tpu.core import math as lm

# practical split scheme: blend of uniform and logarithmic (λ) — the
# reference ships fixed tuned distances; λ=0.75 reproduces that shape
SPLIT_LAMBDA = 0.75
NUM_CASCADES = 4


@struct.dataclass
class ShadowView:
    """Per-cascade light-space data + caster visibility."""

    splits: jnp.ndarray        # f32 [NC+1] slice distances (near→far)
    center: jnp.ndarray        # f32 [NC, 3] cascade bounding-sphere centers
    radius: jnp.ndarray        # f32 [NC]
    light_pos: jnp.ndarray     # f32 [NC, 3] ortho camera position
    extent: jnp.ndarray        # f32 [NC, 3] ortho half-extents (w, h, depth)
    casters: jnp.ndarray       # bool [NC, K]
    caster_count: jnp.ndarray  # int32 [NC]


def cascade_splits(near, far, n: int = NUM_CASCADES,
                   lam: float = SPLIT_LAMBDA) -> jnp.ndarray:
    """Slice distances [n+1] mixing uniform and log splits."""
    i = jnp.arange(n + 1, dtype=jnp.float32) / n
    uni = near + (far - near) * i
    log = near * (far / near) ** i
    return lam * log + (1.0 - lam) * uni


def _frustum_slice_corners(pos, rot, fov_y, aspect, zn, zf):
    """8 world-space corners of the camera frustum slice [zn, zf] → [8, 3]."""
    th = jnp.tan(fov_y * 0.5)
    fwd = lm.quat_rotate(rot, jnp.asarray([0.0, 0.0, -1.0]))
    right = lm.quat_rotate(rot, jnp.asarray([1.0, 0.0, 0.0]))
    up = lm.quat_rotate(rot, jnp.asarray([0.0, 1.0, 0.0]))
    cs = []
    for z in (zn, zf):
        hy = th * z
        hx = hy * aspect
        c = pos + fwd * z
        for sx in (-1.0, 1.0):
            for sy in (-1.0, 1.0):
                cs.append(c + right * (sx * hx) + up * (sy * hy))
    return jnp.stack(cs)  # [8, 3]


def light_rotation(direction) -> jnp.ndarray:
    """Quat orienting -Z along the (normalized) light direction."""
    d = jnp.asarray(direction, jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-9)
    z = -d
    up0 = jnp.where(jnp.abs(z[1]) > 0.99,
                    jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    x = jnp.cross(up0, z)
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-9)
    y = jnp.cross(z, x)
    # rotation matrix (cols x,y,z) → quat
    m00, m11, m22 = x[0], y[1], z[2]
    t = m00 + m11 + m22
    qw = jnp.sqrt(jnp.maximum(1.0 + t, 1e-9)) * 0.5
    qx = (y[2] - z[1]) / (4.0 * qw)
    qy = (z[0] - x[2]) / (4.0 * qw)
    qz = (x[1] - y[0]) / (4.0 * qw)
    return lm.quat_normalize(jnp.stack([qx, qy, qz, qw]))


def shadow_pass(ws, module, light_dir, cam_slot: int = 0,
                statics=None, z_margin: float = 50.0) -> ShadowView:
    """Fit NUM_CASCADES stable cascades to camera `cam_slot` and cull casters
    (model instances) per cascade. Stable = ortho fit to the slice's bounding
    SPHERE, like the reference (avoids shimmer under camera rotation)."""
    from lumixengine_tpu.renderer import pipeline as pl

    statics = statics or module.statics()
    rs = ws.modules[module.name]
    cam_slot = pl.resolve_cam_slot(statics, cam_slot)
    cam_e = max(int(statics.cam_slots[cam_slot]), 0)
    pos = ws.world.pos[..., :, cam_e]
    rot = ws.world.rot[..., :, cam_e]
    near = rs.cam_near[cam_slot]
    far = jnp.minimum(rs.cam_far[cam_slot], 1024.0)
    fov = rs.cam_fov[cam_slot]
    aspect = rs.cam_aspect[cam_slot]

    splits = cascade_splits(near, far)
    ldir = jnp.asarray(light_dir, jnp.float32)
    ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-9)
    lrot = light_rotation(ldir)

    centers, radii, lpos, extents, caster_masks, counts = [], [], [], [], [], []
    eidx = jnp.asarray(np.maximum(statics.mi_slots, 0))
    ipos = jnp.take(ws.world.pos, eidx, axis=-1)       # [3, K]
    iscale = jnp.take(ws.world.scale, eidx, axis=-1)
    obj_r = jnp.asarray(statics.radius) * jnp.max(jnp.abs(iscale), axis=-2)
    alive = jnp.take(ws.alive, eidx, axis=-1) & jnp.asarray(statics.mi_mask)

    for i in range(NUM_CASCADES):
        corners = _frustum_slice_corners(pos, rot, fov, aspect,
                                         splits[i], splits[i + 1])
        c = jnp.mean(corners, axis=0)
        r = jnp.max(jnp.linalg.norm(corners - c, axis=-1))
        lp = c - ldir * (r + z_margin)
        ext = jnp.stack([r, r, r + z_margin])
        fr = geom.ortho_frustum(lp, lrot, 2.0 * r, 2.0 * r,
                                0.0, 2.0 * r + z_margin)
        vis = geom.frustum_sphere_visible(fr, ipos, obj_r) & alive
        centers.append(c)
        radii.append(r)
        lpos.append(lp)
        extents.append(ext)
        caster_masks.append(vis)
        counts.append(jnp.sum(vis).astype(jnp.int32))

    return ShadowView(
        splits=splits,
        center=jnp.stack(centers),
        radius=jnp.stack(radii),
        light_pos=jnp.stack(lpos),
        extent=jnp.stack(extents),
        casters=jnp.stack(caster_masks),
        caster_count=jnp.stack(counts),
    )


def cascade_matrices(sv: ShadowView, light_dir) -> jnp.ndarray:
    """Light view-projection matrices [NC, 4, 4] (row-vector convention) for
    the consumer (≙ the cascade matrices the reference uploads as uniforms)."""
    ldir = jnp.asarray(light_dir, jnp.float32)
    ldir = ldir / jnp.maximum(jnp.linalg.norm(ldir), 1e-9)
    lrot = light_rotation(ldir)
    inv = lm.quat_conjugate(lrot)
    mats = []
    for i in range(NUM_CASCADES):
        # view: world → light space
        ex = sv.extent[i]
        p = sv.light_pos[i]
        axes = jnp.stack([lm.quat_rotate(inv, jnp.eye(3)[j]) for j in range(3)])
        # ortho: x/ex.x, y/ex.y, z mapped [0, 2*ex.z] → [0, 1]
        view = jnp.eye(4)
        view = view.at[:3, :3].set(axes.T)
        view = view.at[3, :3].set(-jnp.stack(
            [jnp.dot(p, axes[j]) for j in range(3)]))
        proj = jnp.diag(jnp.stack([1.0 / ex[0], 1.0 / ex[1],
                                   -0.5 / ex[2], jnp.float32(1.0)]))
        proj = proj.at[3, 2].set(0.0)
        mats.append(view @ proj)
    return jnp.stack(mats)
