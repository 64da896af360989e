"""AnimationModule + AnimationSystem (≙ reference src/animation/animation_module.{h,cpp},
animation_system.cpp).

Reference components: Animable (single looping clip; updateAnimable =
bind pose → sample clip → computeAbsolute → advance time modulo length,
animation_module.cpp), Animator (controller graph → blend stack → pose +
root motion applied to the entity transform, updateAnimator), PropertyAnimator
(curves → reflected properties). Phases: updateParallel runs animators via
jobs::forEach; update runs animables (forEach step 32).

TPU re-architecture: per-frame animation is a handful of batched kernels over
the whole animator population:
  sampling   = one two-hot matmul per blend slot      (ops/sampling.py)
  blending   = sequential nlerp over ≤S slots         (ops/pose.py)
  absolute   = static per-skeleton level scan         (ops/pose.py)
  palettes   = fused dual-quat build                  (ops/skinning.py)
  root motion= root-track sampling + rigid delta applied to entity locals
Animators/animables are grouped by (model, controller) host-side; each group
is a static column range (gather/scatter with trace-time constants). Poses and
palettes live in a pool [C, B, P] in the module state, consumed by the render
pipeline (skinning palettes ≙ pipeline.cpp computeSkeletonDualQuats upload).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.animation.animation import ClipRegistry
from lumixengine_tpu.animation.controller import Controller
from lumixengine_tpu.core import math as lm
from lumixengine_tpu.engine.plugin import IModule, ISystem
from lumixengine_tpu.engine.world import World, WorldState
from lumixengine_tpu.ops import pose as pose_ops
from lumixengine_tpu.ops import sampling, skinning
from lumixengine_tpu.utils.store import DenseStore


@struct.dataclass
class AnimState:
    an_time: jnp.ndarray       # f32 [A1] animable clocks
    ctrl_inputs: jnp.ndarray   # f32 [I, A2] controller inputs (columns = animators)
    ctrl_clocks: jnp.ndarray   # f32 [T, A2] per-node clocks
    pose_pos: jnp.ndarray      # f32 [3, B, P] final model-space pose pool
    pose_rot: jnp.ndarray      # f32 [4, B, P]
    palette: jnp.ndarray       # f32 [8, B, P] dual-quat skinning palettes
    pa_enabled: jnp.ndarray    # bool [PA] property-animator enable flags
    counters: Dict[str, jnp.ndarray]


# (component, property) → RenderState field + index kind for fused property
# animation (≙ PropertyAnimator applying to reflected properties each frame)
_DEVICE_PROP_TARGETS = {
    ("point_light", "intensity"): ("pl_intensity", "point_lights"),
    ("point_light", "range"): ("pl_range", "point_lights"),
    ("camera", "fov"): ("cam_fov", "cameras"),
}

# transform channels animate entity LOCAL rows directly (≙ PropertyAnimation
# POS_*/LOCAL_POS_*/SCALE_* curve types — the demo map's moving platform)
_TRANSFORM_TARGETS = {
    ("transform", "x"): ("pos", 0),
    ("transform", "y"): ("pos", 1),
    ("transform", "z"): ("pos", 2),
    ("transform", "scale_x"): ("scale", 0),
    ("transform", "scale_y"): ("scale", 1),
    ("transform", "scale_z"): ("scale", 2),
}


class AnimStatics:
    """Trace-time constants: group layouts, slots, plans, inverse binds."""

    def __init__(self, module: "AnimationModule"):
        w = module.world
        rmod = w.modules.get("renderer")
        models = module.system.renderer.models if module.system.renderer else None

        def model_of(entity: int) -> int:
            if rmod is None or entity < 0 or entity not in rmod.model_instances:
                return 0
            return int(rmod.model_instances.get(entity, "model"))

        def skeleton_data(mid: int):
            """Bone data padded to the clip bank's bone count (identity pads)."""
            b = module.system.max_bones
            parent = np.full(b, -1, np.int32)
            ibp = np.zeros((3, b), np.float32)
            ibr = np.tile(np.array([[0.0], [0.0], [0.0], [1.0]], np.float32), (1, b))
            mdl = models.get(mid) if models else None
            sk = mdl.skeleton if (mdl and mdl.skeleton) else None
            if sk is not None:
                nb = min(sk.bone_count, b)
                parent[:nb] = sk.bone_parent[:nb]
                p, r = sk.inverse_bind()
                ibp[:, :nb] = p[:nb].T
                ibr[:, :nb] = r[:nb].T
            return parent, ibp, ibr

        # animable groups by model
        self.an_groups = []
        ents = module.animables.entity
        by_model: Dict[int, List[int]] = {}
        for slot in range(module.animables.capacity):
            if ents[slot] >= 0:
                by_model.setdefault(model_of(int(ents[slot])), []).append(slot)
        for mid, slots in sorted(by_model.items()):
            bp, ibp, ibr = skeleton_data(mid)
            self.an_groups.append(
                dict(
                    model=mid,
                    cols=np.asarray(slots, np.int32),
                    entity_slots=w.to_slots(ents[np.asarray(slots)]),
                    clips=np.asarray(module.animables.data["clip"][np.asarray(slots)], np.int32),
                    scale=np.asarray(module.animables.data["time_scale"][np.asarray(slots)], np.float32),
                    plan=pose_ops.BonePlan(bp),
                    inv_bind_pos=ibp,
                    inv_bind_rot=ibr,
                )
            )
        # animator groups by (model, controller)
        self.at_groups = []
        ents = module.animators.entity
        by_key: Dict[tuple, List[int]] = {}
        for slot in range(module.animators.capacity):
            if ents[slot] >= 0:
                cid = int(module.animators.data["controller"][slot])
                by_key.setdefault((model_of(int(ents[slot])), cid), []).append(slot)
        for (mid, cid), slots in sorted(by_key.items()):
            bp, ibp, ibr = skeleton_data(mid)
            self.at_groups.append(
                dict(
                    model=mid,
                    controller=module.system.controllers[cid],
                    cols=np.asarray(slots, np.int32),
                    entity_slots=w.to_slots(ents[np.asarray(slots)]),
                    plan=pose_ops.BonePlan(bp),
                    inv_bind_pos=ibp,
                    inv_bind_rot=ibr,
                )
            )


class AnimationModule(IModule):
    name = "animation"
    COMPONENT_STORES = {"animable": "animables", "animator": "animators"}

    def __init__(self, world: World, system: "AnimationSystem",
                 max_animables: int = 1024, max_animators: int = 256,
                 max_controller_inputs: int = 8, build_palettes: bool = True):
        super().__init__(world, system)
        self.animables = DenseStore(
            max_animables,
            {"clip": ((), np.int32, -1), "time_scale": ((), np.float32, 1.0),
             "start_time": ((), np.float32, 0.0)},
        )
        self.animators = DenseStore(
            max_animators,
            {"controller": ((), np.int32, -1)},
        )
        self.default_inputs = np.zeros((max_controller_inputs, max_animators), np.float32)
        self.property_animators: Dict[int, list] = {}
        self.pa_default_enabled: Dict[int, bool] = {}
        self.build_palettes = build_palettes
        self._statics: Optional[AnimStatics] = None
        self._statics_version = -1

    # -- components -----------------------------------------------------------

    def component_types(self):
        return ["animable", "animator", "property_animator"]

    def create_component(self, entity: int, ctype: str, **props):
        self.invalidate_statics()
        if ctype == "animable":
            clip = props.get("clip", -1)
            if isinstance(clip, str):
                clip = self.system.clips.get_id(clip)
            self.animables.add(entity, clip=np.int32(clip),
                               time_scale=np.float32(props.get("time_scale", 1.0)),
                               start_time=np.float32(props.get("start_time", 0.0)))
        elif ctype == "animator":
            ctrl = props.get("controller", -1)
            if isinstance(ctrl, str):
                ctrl = self.system.controller_id(ctrl)
            slot = self.animators.add(entity, controller=np.int32(ctrl))
            for name, v in props.get("inputs", {}).items():
                c = self.system.controllers[int(ctrl)]
                self.default_inputs[c.input_index(name), slot] = np.float32(v)
        elif ctype == "property_animator":
            # ≙ animation_module.cpp PropertyAnimators: keyframe curves driving
            # reflected properties. Device-visible rows (point_light intensity/
            # range, camera fov) are animated INSIDE the fused step via baked
            # static curves + jnp.interp; other reflected props can be driven
            # host-side through reflection.set_property.
            curves = []
            for cur in props.get("curves", []):
                curves.append({
                    "component": cur["component"],
                    "property": cur["property"],
                    "times": np.asarray(cur["times"], np.float32),
                    "values": np.asarray(cur["values"], np.float32),
                })
                key = (cur["component"], cur["property"])
                if key not in _DEVICE_PROP_TARGETS and key not in _TRANSFORM_TARGETS:
                    raise KeyError(
                        f"property_animator target {cur['component']}.{cur['property']}"
                        " has no device row (host-side reflection animation instead)")
            self.property_animators[entity] = curves
            self.pa_default_enabled[entity] = bool(props.get("enabled", True))
        else:
            raise KeyError(ctype)

    def destroy_component(self, entity: int, ctype: str) -> None:
        self.invalidate_statics()
        if ctype == "animable":
            self.animables.remove(entity)
        elif ctype == "animator":
            self.animators.remove(entity)
        elif ctype == "property_animator":
            self.property_animators.pop(entity, None)

    def set_animator_input(self, entity: int, name: str, value: float) -> None:
        """Host-side default; runtime writes go through AnimState.ctrl_inputs."""
        slot = self.animators.slot_of(entity)
        cid = int(self.animators.data["controller"][slot])
        c = self.system.controllers[cid]
        self.default_inputs[c.input_index(name), slot] = np.float32(value)

    # -- serialization -----------------------------------------------------------

    def serialize(self):
        out = {}
        for slot in range(self.animators.capacity):
            e = int(self.animators.entity[slot])
            if e >= 0:
                out[str(e)] = self.default_inputs[:, slot].tolist()
        return {"animator_inputs": out}

    def deserialize(self, blob, emap):
        for old_str, vals in blob.get("animator_inputs", {}).items():
            new = emap.get(int(old_str))
            if new < 0:
                continue
            slot = self.animators.slot_of(new)
            if slot >= 0:
                self.default_inputs[: len(vals), slot] = vals

    # -- statics / state --------------------------------------------------------

    def invalidate_statics(self):
        self._statics = None

    def prepare_statics(self):
        self.world._refresh_levels()
        if self._statics is None or self._statics_version != self.world.topology_version:
            self._statics = AnimStatics(self)
            self._statics_version = self.world.topology_version
        _ = self.system.bank  # bake clip bank outside traces

    def statics(self) -> AnimStatics:
        self.prepare_statics()
        return self._statics

    @property
    def pool_size(self) -> int:
        return self.animables.capacity + self.animators.capacity

    def pool_col_animable(self, slot: int) -> int:
        return slot

    def pool_col_animator(self, slot: int) -> int:
        return self.animables.capacity + slot

    def device_state(self) -> AnimState:
        b = self.system.max_bones
        p = self.pool_size
        a2 = self.animators.capacity
        t_max = max([1] + [c.num_clocks for c in self.system.controllers])
        return AnimState(
            an_time=jnp.asarray(self.animables.data["start_time"]),
            ctrl_inputs=jnp.asarray(self.default_inputs),
            ctrl_clocks=jnp.zeros((t_max, a2), jnp.float32),
            pose_pos=jnp.zeros((3, b, p), jnp.float32),
            pose_rot=jnp.zeros((4, b, p), jnp.float32).at[3].set(1.0),
            palette=jnp.zeros((8, b, p), jnp.float32).at[3].set(1.0),
            pa_enabled=jnp.asarray([self.pa_default_enabled.get(e, True)
                                    for e in sorted(self.property_animators)]
                                   or [True], bool),
            counters={"animated": jnp.int32(0)},
        )

    # -- phases -----------------------------------------------------------------

    def update_parallel(self, state: WorldState, dt) -> WorldState:
        """Animators (≙ animation_module.cpp updateParallel → updateAnimator)."""
        st = self.statics()
        ms: AnimState = state.modules[self.name]
        bank = self.system.bank
        bstat = self.system.bank_statics
        a1 = self.animables.capacity

        pose_pos, pose_rot, palette = ms.pose_pos, ms.pose_rot, ms.palette
        ctrl_clocks = ms.ctrl_clocks
        local = state.local

        for g in st.at_groups:
            cols = jnp.asarray(g["cols"])
            ctrl: Controller = g["controller"]
            inputs_g = jnp.take(ms.ctrl_inputs, cols, axis=-1)[: max(ctrl.num_inputs, 1)]
            clocks_g = jnp.take(ctrl_clocks, cols, axis=-1)
            slots, slot_masks, new_clocks = ctrl.eval(inputs_g, clocks_g[: ctrl.num_clocks], dt)
            if ctrl.num_clocks:
                ctrl_clocks = ctrl_clocks.at[..., : ctrl.num_clocks, cols].set(new_clocks)

            # blend stack execution (≙ controller.cpp evalBlendStack)
            acc_pos = acc_rot = None
            cum_w = None
            root_dp = root_dr = None
            any_rm = None
            end_p_t = jnp.asarray(bstat.root_end_pos.T)
            end_r_t = jnp.asarray(bstat.root_end_rot.T)
            for s, (clip, t, wgt, prev_t) in enumerate(slots):
                p_s, r_s = sampling.sample_clips(bank.table, t, clip, bstat)
                slot_rm = (
                    (jnp.asarray(bstat.clip_flags)[jnp.maximum(clip, 0)] != 0)
                    & (clip >= 0) & (wgt > 1e-6)
                )
                any_rm = slot_rm if any_rm is None else (any_rm | slot_rm)
                # per-slot root-motion delta over this frame's clock advance
                # (≙ animation.cpp getRootMotion differencing, incl. loop wrap)
                rp_c, rr_c = sampling.sample_root_motion(bank.root_motion, t, clip, bstat)
                rp_p, rr_p = sampling.sample_root_motion(bank.root_motion, prev_t, clip, bstat)
                inv_pr = lm.quat_conjugate(rr_p, axis=-2)
                d_p = lm.quat_rotate(inv_pr, rp_c - rp_p, axis=-2)
                d_r = lm.quat_mul(inv_pr, rr_c, axis=-2)
                end_p = end_p_t[:, jnp.maximum(clip, 0)]
                end_r = end_r_t[:, jnp.maximum(clip, 0)]
                dw1_p = lm.quat_rotate(inv_pr, end_p - rp_p, axis=-2)
                dw1_r = lm.quat_mul(inv_pr, end_r, axis=-2)
                dw_p = dw1_p + lm.quat_rotate(dw1_r, rp_c, axis=-2)
                dw_r = lm.quat_mul(dw1_r, rr_c, axis=-2)
                wrapped = jnp.expand_dims(t < prev_t, -2)
                dp_s = jnp.where(wrapped, dw_p, d_p) * jnp.expand_dims(slot_rm, -2)
                dr_s = jnp.where(
                    jnp.expand_dims(slot_rm, -2) & wrapped, dw_r,
                    jnp.where(jnp.expand_dims(slot_rm, -2), d_r,
                              jnp.zeros_like(d_r).at[..., 3, :].set(1.0)),
                )
                if acc_pos is None:
                    acc_pos, acc_rot = p_s, r_s
                    cum_w = jnp.maximum(wgt, 1e-6)
                    root_dp, root_dr = dp_s, dr_s
                else:
                    new_cum = cum_w + wgt
                    f = wgt / jnp.maximum(new_cum, 1e-6)
                    if s in slot_masks:
                        acc_pos, acc_rot = pose_ops.masked_blend(
                            acc_pos, acc_rot, p_s, r_s, f, slot_masks[s]
                        )
                    else:
                        acc_pos, acc_rot = pose_ops.blend(acc_pos, acc_rot, p_s, r_s, f)
                    root_dp = root_dp + (dp_s - root_dp) * jnp.expand_dims(f, -2)
                    root_dr = lm.quat_nlerp(root_dr, dr_s, f, axis=-2)
                    cum_w = new_cum

            if acc_pos is None:
                continue
            apos, arot = pose_ops.compute_absolute(acc_pos, acc_rot, g["plan"])

            # IK passes (≙ controller.cpp IK in the blend stack): FABRIK on the
            # chain joints in model space, alpha-blended, rotations re-aligned
            for ik_node in ctrl.ik_requests:
                from lumixengine_tpu.ops import ik as ik_ops

                chain = np.asarray(ik_node.chain, np.int32)
                tx = inputs_g[ik_node.target_inputs[0]]
                ty = inputs_g[ik_node.target_inputs[1]]
                tz = inputs_g[ik_node.target_inputs[2]]
                target = jnp.stack([tx, ty, tz], axis=-2)
                if isinstance(ik_node.alpha, int) and not isinstance(ik_node.alpha, bool):
                    alpha = inputs_g[ik_node.alpha]
                else:
                    alpha = float(ik_node.alpha)
                joints = apos[..., :, chain, :]
                solved = ik_ops.apply_ik(joints, target, alpha)
                deltas = ik_ops.chain_rotation_deltas(joints, solved)
                apos = apos.at[..., :, chain, :].set(solved)
                arot = arot.at[..., :, chain[:-1], :].set(
                    lm.quat_mul(deltas, arot[..., :, chain[:-1], :], axis=-3)
                )

            pool_cols = jnp.asarray(a1 + g["cols"])
            pose_pos = pose_pos.at[..., :, pool_cols].set(apos)
            pose_rot = pose_rot.at[..., :, pool_cols].set(arot)
            if self.build_palettes:
                pal = skinning.build_palette_dq(
                    apos, arot, jnp.asarray(g["inv_bind_pos"]), jnp.asarray(g["inv_bind_rot"])
                )
                palette = palette.at[..., :, pool_cols].set(pal)

            # root motion → entity local transform (≙ updateAnimator root motion:
            # entity.pos += entity.rot * delta.pos; entity.rot *= delta.rot)
            hm2 = jnp.expand_dims(any_rm, -2)
            eslots = jnp.asarray(np.maximum(g["entity_slots"], 0))
            lp = jnp.take(local.pos, eslots, axis=-1)
            lr = jnp.take(local.rot, eslots, axis=-1)
            new_lp = lp + lm.quat_rotate(lr, root_dp, axis=-2)
            new_lr = lm.quat_normalize(lm.quat_mul(lr, root_dr, axis=-2), axis=-2)
            lp = jnp.where(hm2, new_lp, lp)
            lr = jnp.where(hm2, new_lr, lr)
            local = local.replace(
                pos=local.pos.at[..., :, eslots].set(lp),
                rot=local.rot.at[..., :, eslots].set(lr),
            )

        ms = ms.replace(
            ctrl_clocks=ctrl_clocks,
            pose_pos=pose_pos, pose_rot=pose_rot, palette=palette,
        )
        return state.replace(local=local, modules={**state.modules, self.name: ms})

    def update(self, state: WorldState, dt) -> WorldState:
        """Animables (≙ animation_module.cpp update → updateAnimable):
        advance clock modulo length, sample, compute absolute, build palette."""
        st = self.statics()
        ms: AnimState = state.modules[self.name]
        bank = self.system.bank
        bstat = self.system.bank_statics

        an_time = ms.an_time
        pose_pos, pose_rot, palette = ms.pose_pos, ms.pose_rot, ms.palette
        total = jnp.int32(0)
        for g in st.an_groups:
            cols = jnp.asarray(g["cols"])
            t = jnp.take(an_time, cols, axis=-1) + dt * jnp.asarray(g["scale"])
            lengths = jnp.asarray(bstat.clip_length)[np.maximum(g["clips"], 0)]
            t = jnp.mod(t, lengths)
            an_time = an_time.at[..., cols].set(t)
            clip_ids = jnp.asarray(g["clips"])
            p, r = sampling.sample_clips(bank.table, t, clip_ids, bstat)
            apos, arot = pose_ops.compute_absolute(p, r, g["plan"])
            pool_cols = jnp.asarray(g["cols"])  # animables occupy [0, A1)
            pose_pos = pose_pos.at[..., :, pool_cols].set(apos)
            pose_rot = pose_rot.at[..., :, pool_cols].set(arot)
            if self.build_palettes:
                pal = skinning.build_palette_dq(
                    apos, arot, jnp.asarray(g["inv_bind_pos"]), jnp.asarray(g["inv_bind_rot"])
                )
                palette = palette.at[..., :, pool_cols].set(pal)
            total = total + jnp.int32(len(g["cols"]))

        ms = ms.replace(
            an_time=an_time, pose_pos=pose_pos, pose_rot=pose_rot, palette=palette,
            counters={**ms.counters, "animated": total},
        )
        state = state.replace(modules={**state.modules, self.name: ms})

        # property animators (≙ updatePropertyAnimators, serial in reference)
        if self.property_animators:
            rmod = self.world.modules.get("renderer")
            rs = state.modules.get("renderer")
            local = state.local
            rs_dirty = local_dirty = False
            pa_index = {e: i for i, e in enumerate(sorted(self.property_animators))}
            for e, curves in self.property_animators.items():
                en = ms.pa_enabled[pa_index[e]]
                for cur in curves:
                    key = (cur["component"], cur["property"])
                    times = cur["times"]
                    dur = float(times[-1]) if len(times) else 1.0
                    t = jnp.mod(state.time, jnp.float32(max(dur, 1e-6)))
                    v = jnp.interp(t, jnp.asarray(times), jnp.asarray(cur["values"]))
                    if key in _TRANSFORM_TARGETS:
                        field, axis = _TRANSFORM_TARGETS[key]
                        slot = self.world.slot(e)
                        if slot < 0:
                            continue
                        arr = getattr(local, field)
                        v_g = jnp.where(en, v, arr[..., axis, slot])
                        local = local.replace(
                            **{field: arr.at[..., axis, slot].set(v_g)})
                        local_dirty = True
                    elif rs is not None:
                        field, store_name = _DEVICE_PROP_TARGETS[key]
                        slot = getattr(rmod, store_name).slot_of(e)
                        if slot < 0:
                            continue
                        cur_v = getattr(rs, field)
                        v_g = jnp.where(en, v, cur_v[..., slot])
                        rs = rs.replace(
                            **{field: cur_v.at[..., slot].set(v_g)})
                        rs_dirty = True
            if local_dirty:
                state = state.replace(local=local)
            if rs_dirty:
                state = state.replace(modules={**state.modules, "renderer": rs})
        return state


class AnimationSystem(ISystem):
    """≙ animation_system.cpp — owns clip + controller resources."""

    name = "animation_system"

    def __init__(self, engine, renderer=None, max_bones: int = 32):
        super().__init__(engine)
        self.clips = ClipRegistry()
        self.controllers: List[Controller] = []
        self._ctrl_by_name: Dict[str, int] = {}
        self.renderer = renderer
        self._max_bones = max_bones
        self._bank = None
        self._bank_statics = None

    @property
    def max_bones(self) -> int:
        if self.renderer is not None and len(self.renderer.models):
            return max(self._max_bones, self.renderer.bank.max_bones)
        return self._max_bones

    def add_clip(self, clip) -> int:
        self._bank = None
        return self.clips.add(clip)

    def add_controller(self, ctrl: Controller) -> int:
        cid = len(self.controllers)
        self.controllers.append(ctrl)
        self._ctrl_by_name[ctrl.name] = cid
        return cid

    def controller_id(self, name: str) -> int:
        return self._ctrl_by_name[name]

    @property
    def bank(self):
        if self._bank is None:
            self._bank, self._bank_statics = self.clips.bake(self.max_bones)
        return self._bank

    @property
    def bank_statics(self):
        _ = self.bank
        return self._bank_statics

    def create_modules(self, world: World) -> AnimationModule:
        caps = getattr(self.engine, "module_capacities", {})
        return AnimationModule(
            world, self,
            max_animables=caps.get("animables", 1024),
            max_animators=caps.get("animators", 256),
        )
