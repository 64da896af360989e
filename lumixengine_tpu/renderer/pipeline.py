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
core/math.py).

Performance rule: component membership (which entity slot backs instance k,
its model id, its cull radius) is STATIC between host edits, so those index
arrays are baked into the traced step as constants — static-index gathers
compile ~15x faster code than data-dependent gathers on TPU (measured). The
step is re-traced when membership changes, exactly like the hierarchy plan.

The fused bench step uses `cull_pass` (visibility + LOD + counters, no sort) —
draw-order sorting and instance-buffer extraction (`prepare_view`) are the
render-consumer path, matching BASELINE.md's "full frame" definition.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.core import geometry as geom
from lumixengine_tpu.engine.world import WorldState
from lumixengine_tpu.ops import culling as cullops
from lumixengine_tpu.renderer.model import MAX_LODS, ModelBank

SORT_DEPTH = 0     # back-to-front depth bucket (transparent)
SORT_MATERIAL = 1  # material/state bucket (opaque) — ≙ pipeline.cpp sort modes


@struct.dataclass
class View:
    """Draw-ready view data (≙ the reference's View + DrawStream payload)."""

    visible: jnp.ndarray       # bool [K]
    lod: jnp.ndarray           # int32 [K]
    sort_key: jnp.ndarray      # uint32 [K] hi word (bucket)
    sort_key_lo: jnp.ndarray   # uint32 [K] lo word (within-bucket order)
    order: jnp.ndarray         # int32 [K] draw order (invisible at tail)
    instance_pos: jnp.ndarray  # f32 [3,K] world positions in draw order (SoA)
    instance_rot: jnp.ndarray  # f32 [4,K]
    instance_scale: jnp.ndarray  # f32 [3,K]
    instance_model: jnp.ndarray  # int32 [K] model id in draw order
    instance_slot: jnp.ndarray   # int32 [K] entity WORLD slot in draw order
    visible_count: jnp.ndarray   # int32 scalar
    lights_visible: jnp.ndarray  # bool [L]
    instanced_visible: jnp.ndarray  # bool [IM] — per instanced-model chunk


class ViewStatics:
    """Trace-time constants for one world's render components: slot indices,
    model ids, cull radii, masks. Rebuilt by the host on membership change."""

    def __init__(self, module):
        w = module.world
        reg = module.system.models
        _ = module.system.bank  # ensure baked (fills the host mirrors)
        self.mi_slots = w.to_slots(module.model_instances.entity)       # [K]
        self.mi_mask = self.mi_slots >= 0                               # [K]
        self.mi_model = np.asarray(module.model_instances.data["model"], np.int32)
        self.radius = np.asarray(module.culling.store.data["radius"], np.float32)
        mid = np.maximum(self.mi_model, 0)
        # host mirrors, NOT bank readbacks: device→host pulls cost seconds
        # each through the TPU tunnel (round-4 map-timeout postmortem)
        self.lod_dist2 = reg.host_lod_dist2[:, mid]                     # [4,K]
        self.material = reg.host_material_id[mid]                       # [K]
        self.cam_slots = w.to_slots(module.cameras.entity)              # [C]
        self.cam_entities = np.asarray(module.cameras.entity, np.int64)  # [C]
        self.pl_slots = w.to_slots(module.point_lights.entity)          # [L]
        self.pl_mask = self.pl_slots >= 0
        # instanced-model chunks (≙ pipeline.cpp encodeInstancedModels):
        # one bounding sphere per component over its instance blob
        im_entities, im_models, im_centers, im_radii = [], [], [], []
        for e, im in module.instanced_models.items():
            pos = im["pos"]
            if len(pos) == 0:
                continue
            center = pos.mean(axis=0)
            mdl_r = float(reg.host_bounding_radius[im["model"]])
            r = float(np.linalg.norm(pos - center, axis=-1).max()) + mdl_r
            im_entities.append(w.slot(e))
            im_models.append(im["model"])
            im_centers.append(center)
            im_radii.append(r)
        self.im_slots = np.asarray(im_entities, np.int32)
        self.im_models = np.asarray(im_models, np.int32)
        self.im_centers = (np.asarray(im_centers, np.float32).T.copy()
                           if im_centers else np.zeros((3, 0), np.float32))
        self.im_radii = np.asarray(im_radii, np.float32)


def resolve_cam_slot(statics: ViewStatics, cam_slot: int) -> int:
    """Validate a camera slot index at every view entry point.

    Accepts either a slot index into the camera store or a camera *entity* id
    (RenderModule.active_camera stores an entity, and passing it here used to
    raise a bare IndexError deep in the traced gather — see
    crash_20260817_061512.txt). Raises a named ValueError otherwise."""
    n = len(statics.cam_slots)
    if 0 <= cam_slot < n:
        return int(cam_slot)
    hits = np.nonzero(statics.cam_entities == cam_slot)[0]
    if hits.size:
        return int(hits[0])
    raise ValueError(
        f"cam_slot {cam_slot} is neither a camera slot (world has {n} cameras)"
        f" nor a camera entity id (cameras: {statics.cam_entities.tolist()})"
    )


def camera_frustum(ws: WorldState, rs, statics: ViewStatics, cam_slot: int) -> geom.Frustum:
    """Build the active camera's frustum from its entity world transform.

    Supports both projections (≙ Viewport::getFrustum): perspective from
    fov/aspect, orthographic from ortho_size (half-height). Both plane sets
    are tiny, so compute both and select per-plane — no data-dependent
    branching under jit."""
    cam_slot = resolve_cam_slot(statics, cam_slot)
    e = max(int(statics.cam_slots[cam_slot]), 0)
    pos = ws.world.pos[..., :, e]
    rot = ws.world.rot[..., :, e]
    persp = geom.perspective_frustum(
        pos, rot, rs.cam_fov[cam_slot], rs.cam_aspect[cam_slot],
        rs.cam_near[cam_slot], rs.cam_far[cam_slot],
    )
    oh = rs.cam_ortho_size[cam_slot]
    ortho = geom.ortho_frustum(
        pos, rot, 2.0 * oh * rs.cam_aspect[cam_slot], 2.0 * oh,
        rs.cam_near[cam_slot], rs.cam_far[cam_slot],
    )
    is_o = rs.cam_is_ortho[cam_slot]
    return geom.Frustum(
        xs=jnp.where(is_o, ortho.xs, persp.xs),
        ys=jnp.where(is_o, ortho.ys, persp.ys),
        zs=jnp.where(is_o, ortho.zs, persp.zs),
        ds=jnp.where(is_o, ortho.ds, persp.ds),
    )


def select_lod(dist2: jnp.ndarray, lod_dist2) -> jnp.ndarray:
    """LOD index = number of switch distances passed (≙ model.h getLODMeshIndices).
    dist2 [..., K], lod_dist2 [4, K] → int32 [..., K]."""
    return jnp.sum(dist2[..., None, :] > jnp.asarray(lod_dist2), axis=-2).astype(jnp.int32)


def _cull_and_lod(ws: WorldState, rs, statics: ViewStatics, cam_slot: int,
                  use_pallas: Optional[bool]):
    """One fused pass: a single static-index gather (pos|scale) per instance
    feeds both the sphere cull and the LOD pick."""
    cam_slot = resolve_cam_slot(statics, cam_slot)
    frustum = camera_frustum(ws, rs, statics, cam_slot)
    cam_e = max(int(statics.cam_slots[cam_slot]), 0)
    cam_pos = ws.world.pos[..., :, cam_e]

    eidx = jnp.asarray(np.maximum(statics.mi_slots, 0))
    packed = jnp.concatenate([ws.world.pos, ws.world.scale], axis=-2)  # [.., 6, N]
    g = jnp.take(packed, eidx, axis=-1)                                # [.., 6, K]
    comp = g.ndim - 2
    ipos = jax.lax.slice_in_dim(g, 0, 3, axis=comp)
    iscale = jax.lax.slice_in_dim(g, 3, 6, axis=comp)

    # 1. cull (≙ CullingSystem::cull via getRenderables)
    max_scale = jnp.max(jnp.abs(iscale), axis=-2)
    radii = jnp.asarray(statics.radius) * max_scale
    visible = cullops.frustum_cull(ipos, radii, frustum, use_pallas=use_pallas)
    alive = jnp.take(ws.alive, eidx, axis=-1) & jnp.asarray(statics.mi_mask)
    visible = visible & alive

    # 2. LOD select by camera distance (≙ pipeline.cpp createSortKeys LOD pick)
    d2 = jnp.sum((ipos - cam_pos[..., None]) ** 2, axis=-2)
    lod = jnp.minimum(select_lod(d2, statics.lod_dist2), MAX_LODS - 1)
    return frustum, visible, lod, d2, ipos, eidx


def prepare_view(
    ws: WorldState,
    module,
    cam_slot: int = 0,
    sort_mode: int = SORT_MATERIAL,
    use_pallas: Optional[bool] = None,
    statics: Optional[ViewStatics] = None,
) -> View:
    statics = statics or module.statics()
    rs = ws.modules[module.name]
    frustum, visible, lod, d2, ipos, eidx = _cull_and_lod(
        ws, rs, statics, cam_slot, use_pallas
    )

    # 3. 64-bit sort keys (≙ pipeline.cpp createSortKeys u64 material|depth
    # keys + radix sort): XLA has no u64 sort without x64 mode, so the key is
    # a (hi, lo) word pair sorted with a two-pass STABLE argsort — the same
    # digit-by-digit idea as the reference's radix sort, full 64-bit order
    material = jnp.asarray(statics.material)
    depth_q = (jnp.sqrt(d2) * 64.0).astype(jnp.uint32)  # 26.6 fixed depth
    if sort_mode == SORT_MATERIAL:
        # opaque: bucket by material|lod, front-to-back inside the bucket
        # (depth lo word gives early-z the same win the reference gets)
        key = (material.astype(jnp.uint32) << jnp.uint32(8)) | lod.astype(jnp.uint32)
        key_lo = depth_q
    else:
        # transparent: back-to-front depth major, material minor
        key = jnp.uint32(0xFFFFFF00) - depth_q
        key_lo = material.astype(jnp.uint32)
    key = jnp.where(visible, key, jnp.uint32(0xFFFFFFFF))
    key_lo = jnp.where(visible, key_lo, jnp.uint32(0xFFFFFFFF))
    order_lo = jnp.argsort(key_lo, stable=True)
    order = jnp.take(order_lo,
                     jnp.argsort(jnp.take(key, order_lo, axis=-1),
                                 stable=True), axis=-1).astype(jnp.int32)

    # 4. instance buffer in draw order (≙ createCommands transient instance data)
    irot = jnp.take(ws.world.rot, eidx, axis=-1)
    iscale = jnp.take(ws.world.scale, eidx, axis=-1)
    model_ids = jnp.where(visible, jnp.asarray(statics.mi_model), -1)
    return View(
        visible=visible,
        lod=lod,
        sort_key=key,
        sort_key_lo=key_lo,
        order=order,
        instance_pos=jnp.take(ipos, order, axis=-1),
        instance_rot=jnp.take(irot, order, axis=-1),
        instance_scale=jnp.take(iscale, order, axis=-1),
        instance_model=jnp.take(model_ids, order),
        instance_slot=jnp.take(eidx, order).astype(jnp.int32),
        visible_count=jnp.sum(visible).astype(jnp.int32),
        lights_visible=_cull_lights(ws, rs, statics, frustum),
        instanced_visible=_cull_instanced(ws, statics, frustum),
    )


def _cull_instanced(ws: WorldState, statics: ViewStatics, frustum: geom.Frustum) -> jnp.ndarray:
    """Chunk-sphere culling for InstancedModel components (the instance blob
    is culled as one sphere in the owner entity's space)."""
    if statics.im_slots.size == 0:
        return jnp.zeros(0, bool)
    eidx = jnp.asarray(np.maximum(statics.im_slots, 0))
    owner = jnp.take(ws.world.pos, eidx, axis=-1)           # [..,3,IM]
    centers = owner + jnp.asarray(statics.im_centers)
    return geom.frustum_sphere_visible(frustum, centers, jnp.asarray(statics.im_radii))


def _cull_lights(ws: WorldState, rs, statics: ViewStatics, frustum: geom.Frustum) -> jnp.ndarray:
    le = jnp.asarray(np.maximum(statics.pl_slots, 0))
    centers = jnp.take(ws.world.pos, le, axis=-1)
    vis = geom.frustum_sphere_visible(frustum, centers, rs.pl_range)
    return vis & jnp.asarray(statics.pl_mask)


def cull_pass(ws: WorldState, dt, module, use_pallas: Optional[bool] = None,
              statics: Optional[ViewStatics] = None) -> WorldState:
    """Fused-step stage: visibility + LOD + light culling + counters for camera
    0, stored back into RenderState. Draw-order sort + instance extraction
    (prepare_view) are left to the render consumer, matching the reference
    where they feed GPU buffers."""
    statics = statics or module.statics()
    rs = ws.modules[module.name]
    frustum, visible, lod, d2, ipos, eidx = _cull_and_lod(ws, rs, statics, 0, use_pallas)
    lights = _cull_lights(ws, rs, statics, frustum)
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
    return ws.replace(modules={**ws.modules, module.name: rs})
