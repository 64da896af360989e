"""Pipeline — per-view render orchestration (≙ reference renderer/pipeline.cpp).

Reference flow (pipeline.cpp cull → "prepare view" job): frustum-cull the
world's renderables, pick LOD by camera distance (model.h LOD distances),
build 64-bit sort keys (material bucket vs depth bucket), radix-sort, and emit
instanced draw commands + skinning palettes into transient GPU buffers.

TPU: the same stages as one fused pass over the dense instance arrays —
visibility mask → per-instance LOD (distance² vs baked lod_dist2) → integer
sort keys (invisible instances get the max key so they compact to the tail) →
`jnp.argsort` (XLA's sort plays the radix sort's role) → gathered instance
transform buffer. All arrays use the SoA layout (instance axis minor, see
core/math.py). The output View is exactly the data a GPU renderer consumes;
rasterization itself is out of scope on TPU (SURVEY.md §7.9).

The fused bench step uses `cull_pass` (visibility + LOD + counters, no sort) —
draw-order sorting and instance-buffer extraction (`prepare_view`) are the
render-consumer path, matching BASELINE.md's "full frame" definition
(transforms + culling + skinning + physics + particles).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.core import geometry as geom
from lumixengine_tpu.engine.world import WorldState
from lumixengine_tpu.renderer import culling_system as cullsys
from lumixengine_tpu.renderer.model import MAX_LODS, ModelBank
from lumixengine_tpu.renderer.render_module import RenderState

SORT_DEPTH = 0     # back-to-front depth bucket (transparent)
SORT_MATERIAL = 1  # material/state bucket (opaque) — ≙ pipeline.cpp sort modes


@struct.dataclass
class View:
    """Draw-ready view data (≙ the reference's View + DrawStream payload)."""

    visible: jnp.ndarray       # bool [K]
    lod: jnp.ndarray           # int32 [K]
    sort_key: jnp.ndarray      # uint32 [K]
    order: jnp.ndarray         # int32 [K] draw order (invisible at tail)
    instance_pos: jnp.ndarray  # f32 [3,K] world positions in draw order (SoA)
    instance_rot: jnp.ndarray  # f32 [4,K]
    instance_scale: jnp.ndarray  # f32 [3,K]
    instance_model: jnp.ndarray  # int32 [K] model id in draw order
    visible_count: jnp.ndarray   # int32 scalar
    lights_visible: jnp.ndarray  # bool [L]


def camera_frustum(ws: WorldState, rs: RenderState, cam_slot: int) -> geom.Frustum:
    """Build the active camera's frustum from its entity world transform."""
    e = jnp.maximum(rs.cam_entity[cam_slot], 0)
    pos = jnp.take(ws.world.pos, e, axis=-1)  # [.., 3]
    rot = jnp.take(ws.world.rot, e, axis=-1)
    return geom.perspective_frustum(
        pos, rot, rs.cam_fov[cam_slot], rs.cam_aspect[cam_slot],
        rs.cam_near[cam_slot], rs.cam_far[cam_slot],
    )


def select_lod(dist2: jnp.ndarray, lod_dist2: jnp.ndarray) -> jnp.ndarray:
    """LOD index = number of switch distances passed (≙ model.h getLODMeshIndices).
    dist2 [..., K], lod_dist2 [..., 4, K] → int32 [..., K]."""
    return jnp.sum(dist2[..., None, :] > lod_dist2, axis=-2).astype(jnp.int32)


def _cull_and_lod(ws: WorldState, rs: RenderState, bank: ModelBank, cam_slot: int,
                  use_pallas: Optional[bool]):
    frustum = camera_frustum(ws, rs, cam_slot)
    cam_e = jnp.maximum(rs.cam_entity[cam_slot], 0)
    cam_pos = jnp.take(ws.world.pos, cam_e, axis=-1)

    # 1. cull (≙ CullingSystem::cull via getRenderables)
    visible = cullsys.cull(rs.culling, ws.world.pos, ws.world.scale, frustum,
                           use_pallas=use_pallas)
    eidx = jnp.maximum(rs.mi_entity, 0)
    alive = jnp.take(ws.alive, eidx, axis=-1) & (rs.mi_entity >= 0)
    visible = visible & alive

    # 2. LOD select by camera distance (≙ pipeline.cpp createSortKeys LOD pick)
    ipos = jnp.take(ws.world.pos, eidx, axis=-1)  # [.., 3, K]
    d2 = jnp.sum((ipos - cam_pos[..., None]) ** 2, axis=-2)
    mid = jnp.maximum(rs.mi_model, 0)
    lod = select_lod(d2, jnp.take(bank.lod_dist2, mid, axis=-1))
    lod = jnp.minimum(lod, MAX_LODS - 1)
    return frustum, visible, lod, d2, ipos, eidx, mid


def prepare_view(
    ws: WorldState,
    rs: RenderState,
    bank: ModelBank,
    cam_slot: int = 0,
    sort_mode: int = SORT_MATERIAL,
    use_pallas: Optional[bool] = None,
) -> View:
    frustum, visible, lod, d2, ipos, eidx, mid = _cull_and_lod(
        ws, rs, bank, cam_slot, use_pallas
    )

    # 3. sort keys (≙ pipeline.cpp createSortKeys 64-bit keys + radix sort)
    material = jnp.take(bank.material_id, mid)
    if sort_mode == SORT_MATERIAL:
        key = (material.astype(jnp.uint32) << jnp.uint32(8)) | lod.astype(jnp.uint32)
    else:
        # depth bucket: quantized distance, far first for back-to-front
        key = jnp.uint32(0xFFFFFF00) - (jnp.sqrt(d2) * 64.0).astype(jnp.uint32)
    key = jnp.where(visible, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key).astype(jnp.int32)

    # 4. instance buffer in draw order (≙ createCommands transient instance data)
    irot = jnp.take(ws.world.rot, eidx, axis=-1)
    iscale = jnp.take(ws.world.scale, eidx, axis=-1)
    return View(
        visible=visible,
        lod=lod,
        sort_key=key,
        order=order,
        instance_pos=jnp.take(ipos, order, axis=-1),
        instance_rot=jnp.take(irot, order, axis=-1),
        instance_scale=jnp.take(iscale, order, axis=-1),
        instance_model=jnp.take(jnp.where(visible, rs.mi_model, -1), order),
        visible_count=jnp.sum(visible).astype(jnp.int32),
        lights_visible=_cull_lights(ws, rs, frustum),
    )


def _cull_lights(ws: WorldState, rs: RenderState, frustum: geom.Frustum) -> jnp.ndarray:
    le = jnp.maximum(rs.pl_entity, 0)
    centers = jnp.take(ws.world.pos, le, axis=-1)
    vis = geom.frustum_sphere_visible(frustum, centers, rs.pl_range)
    return vis & (rs.pl_entity >= 0)


def cull_pass(ws: WorldState, dt, bank: ModelBank, module_name: str = "renderer",
              use_pallas: Optional[bool] = None) -> WorldState:
    """Fused-step stage: visibility + LOD + light culling + counters for camera
    0, stored back into RenderState. Draw-order sort + instance extraction
    (prepare_view) are left to the render consumer, matching the reference
    where they feed GPU buffers."""
    rs: RenderState = ws.modules[module_name]
    frustum, visible, lod, d2, ipos, eidx, mid = _cull_and_lod(ws, rs, bank, 0, use_pallas)
    lights = _cull_lights(ws, rs, frustum)
    rs = rs.replace(
        mi_visible=visible,
        mi_lod=lod,
        pl_visible=lights,
        counters={
            **rs.counters,
            "visible_count": jnp.sum(visible).astype(jnp.int32),
            "lights_visible": jnp.sum(lights).astype(jnp.int32),
        },
    )
    return ws.replace(modules={**ws.modules, module_name: rs})
