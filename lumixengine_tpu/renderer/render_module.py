"""RenderModule + Renderer system (≙ reference renderer/render_module.{h,cpp},
renderer.cpp).

Reference RenderModule holds the per-world render components (Camera,
ModelInstance, PointLight, Environment, ParticleEmitter, Terrain, Decal, ...),
registers movables into the CullingSystem, stores prev-frame transforms at
endFrame for motion vectors, and ticks particle systems in update. The Renderer
system owns device resources and frame pacing.

TPU: the Renderer system owns the ModelRegistry/ModelBank (the "GPU resident"
data); the RenderModule owns SoA component stores + the CullingSystem and
contributes pure phases: endFrame snapshots prev transforms, update ticks
particle emitters (renderer/particle_system.py), and the view extraction
(cull → LOD → sort keys) lives in renderer/pipeline.py.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.core.transform import Transform
from lumixengine_tpu.engine.plugin import IModule, ISystem
from lumixengine_tpu.engine.world import World, WorldState
from lumixengine_tpu.renderer.culling_system import CullingState, CullingSystem
from lumixengine_tpu.renderer.model import Model, ModelBank, ModelRegistry
from lumixengine_tpu.utils.store import DenseStore


@struct.dataclass
class RenderState:
    culling: CullingState
    # model instances, slot-parallel with culling store
    mi_entity: jnp.ndarray      # int32 [K]
    mi_model: jnp.ndarray       # int32 [K]
    mi_visible: jnp.ndarray     # bool [K] (output of last cull pass)
    mi_lod: jnp.ndarray         # int32 [K]
    prev_pos: jnp.ndarray       # f32 [3,K] prev-frame world pos (motion vectors)
    prev_rot: jnp.ndarray       # f32 [4,K]
    # cameras
    cam_entity: jnp.ndarray     # int32 [C]
    cam_fov: jnp.ndarray        # f32 [C] vertical fov (radians)
    cam_near: jnp.ndarray       # f32 [C]
    cam_far: jnp.ndarray        # f32 [C]
    cam_aspect: jnp.ndarray     # f32 [C]
    cam_ortho_size: jnp.ndarray  # f32 [C] half-height when orthographic
    cam_is_ortho: jnp.ndarray   # bool [C]
    # point lights
    pl_entity: jnp.ndarray      # int32 [L]
    pl_color: jnp.ndarray       # f32 [3,L]
    pl_intensity: jnp.ndarray   # f32 [L]
    pl_range: jnp.ndarray       # f32 [L]
    pl_visible: jnp.ndarray     # bool [L]
    # environment (directional light)
    env_entity: jnp.ndarray     # int32 [1]
    env_color: jnp.ndarray      # f32 [3]
    env_intensity: jnp.ndarray  # f32 []
    # particle systems: component key -> {emitter name -> EmitterState}
    particles: Dict[str, Any]
    prng: jnp.ndarray           # uint32 PRNG key (particle randomness)
    counters: Dict[str, jnp.ndarray]


class RenderModule(IModule):
    name = "renderer"
    COMPONENT_STORES = {"model_instance": "model_instances", "camera": "cameras",
                        "point_light": "point_lights", "decal": "decals",
                        "curve_decal": "curve_decals", "terrain": "terrains",
                        "reflection_probe": "reflection_probes",
                        "environment_probe": "environment_probes",
                        "bone_attachment": "bone_attachments"}

    def __init__(self, world: World, system: "RendererSystem",
                 max_model_instances: int = 4096, max_cameras: int = 4,
                 max_point_lights: int = 256):
        super().__init__(world, system)
        self.culling = CullingSystem(max_model_instances)
        self.model_instances = DenseStore(
            max_model_instances, {"model": ((), np.int32, -1)}
        )
        self.cameras = DenseStore(
            max_cameras,
            {
                "fov": ((), np.float32, np.radians(60.0)),
                "near": ((), np.float32, 0.1),
                "far": ((), np.float32, 10000.0),
                "aspect": ((), np.float32, 16.0 / 9.0),
                # ≙ render_module.h Camera ortho_size / is_ortho
                "ortho_size": ((), np.float32, 10.0),
                "is_ortho": ((), np.bool_, False),
            },
        )
        self.point_lights = DenseStore(
            max_point_lights,
            {
                "color": ((3,), np.float32, 1.0),
                "intensity": ((), np.float32, 1.0),
                "range": ((), np.float32, 10.0),
                # ≙ render_module.h PointLight fov (spot cone) / attenuation
                "fov": ((), np.float32, 2.0 * np.pi),
                "attenuation": ((), np.float32, 1.0),
            },
        )
        self.env_entity = -1
        self.env_color = np.ones(3, np.float32)
        self.env_intensity = np.float32(1.0)
        self.active_camera = -1
        # particle emitter components: key -> (entity, ParticleSystem instance)
        self.particle_emitters: Dict[str, tuple] = {}
        # per-emitter-component `global` script inputs (name -> value), set by
        # game code via set_particle_global (≙ GLOBAL DataStreams fed from Lua)
        self.particle_globals: Dict[str, Dict[str, object]] = {}
        # ≙ render_module.h Decal / CurveDecal
        self.decals = DenseStore(256, {
            "material": ((), np.int32, 0),
            "half_extents": ((3,), np.float32, 0.5),
            "uv_scale": ((2,), np.float32, 1.0),
        })
        self.curve_decals = DenseStore(64, {
            "material": ((), np.int32, 0),
            "half_extents": ((3,), np.float32, 0.5),
            "uv_scale": ((2,), np.float32, 1.0),
            "bezier_p0": ((2,), np.float32, 0.0),
            "bezier_p2": ((2,), np.float32, 1.0),
        })
        # ≙ Terrain component (heightmap id into RendererSystem.terrains)
        self.terrains = DenseStore(8, {"terrain": ((), np.int32, -1)})
        # ≙ ReflectionProbe / EnvironmentProbe
        self.reflection_probes = DenseStore(32, {
            "size": ((), np.int32, 128),
            "half_extents": ((3,), np.float32, 10.0),
        })
        self.environment_probes = DenseStore(32, {
            "inner": ((3,), np.float32, 5.0),
            "outer": ((3,), np.float32, 10.0),
        })
        # ≙ BoneAttachment: entity follows a bone of an animated parent
        self.bone_attachments = DenseStore(64, {
            "parent_entity": ((), np.int32, -1),
            "bone": ((), np.int32, 0),
            "offset_pos": ((3,), np.float32, 0.0),
            "offset_rot": ((4,), np.float32, (0.0, 0.0, 0.0, 1.0)),
        })
        # ≙ InstancedModel: per-entity instance blobs (host arrays)
        self.instanced_models: Dict[int, dict] = {}
        # ≙ ProceduralGeometry: per-entity vertex blobs
        self.procedural_geometries: Dict[int, dict] = {}
        self._statics = None  # trace-time constants cache (pipeline.ViewStatics)
        self._statics_version = -1

    # -- component API ------------------------------------------------------

    def component_types(self):
        return ["model_instance", "camera", "point_light", "environment",
                "particle_emitter", "terrain", "decal", "curve_decal",
                "instanced_model", "procedural_geometry", "reflection_probe",
                "environment_probe", "bone_attachment"]

    def statics(self):
        """Trace-time constants (slot indices, model ids, radii) — rebuilt on
        membership change; baked into traced steps for static-index gathers."""
        self.world._refresh_levels()
        if self._statics is None or self._statics_version != self.world.topology_version:
            from lumixengine_tpu.renderer.pipeline import ViewStatics

            self._statics = ViewStatics(self)
            self._statics_version = self.world.topology_version
        return self._statics

    def invalidate_statics(self) -> None:
        self._statics = None

    def prepare_statics(self) -> None:
        _ = self.system.bank  # bake the model bank outside any trace
        _ = self.statics()

    def create_component(self, entity: int, ctype: str, **props):
        self.invalidate_statics()
        if ctype == "model_instance":
            model_name = props.get("model")
            mid = self.system.models.get_id(model_name) if isinstance(model_name, str) else int(model_name)
            self.model_instances.add(entity, model=mid)
            radius = self.system.models.get(mid).bounding_radius
            self.culling.add(entity, radius)
        elif ctype == "camera":
            self.cameras.add(entity, **props)
            if self.active_camera < 0:
                self.active_camera = entity
        elif ctype == "point_light":
            self.point_lights.add(entity, **props)
        elif ctype == "environment":
            self.env_entity = entity
            if "color" in props:
                self.env_color = np.asarray(props["color"], np.float32)
            if "intensity" in props:
                self.env_intensity = np.float32(props["intensity"])
        elif ctype == "particle_emitter":
            # ≙ render_module.h ParticleEmitter component: instantiates a
            # compiled particle script on this entity
            ps = self.system.particle_system(
                props["script"], capacity_override=props.get("capacities")
            )
            ps.script_name = props["script"]
            self.particle_emitters[f"pe{entity}"] = (entity, ps)
        elif ctype == "terrain":
            tid = props.get("terrain", -1)
            self.terrains.add(entity, terrain=np.int32(tid))
        elif ctype == "decal":
            self.decals.add(entity,
                            material=np.int32(props.get("material", 0)),
                            half_extents=np.asarray(props.get("half_extents", (0.5, 0.5, 0.5)), np.float32),
                            uv_scale=np.asarray(props.get("uv_scale", (1.0, 1.0)), np.float32))
        elif ctype == "curve_decal":
            self.curve_decals.add(entity,
                                  material=np.int32(props.get("material", 0)),
                                  half_extents=np.asarray(props.get("half_extents", (0.5, 0.5, 0.5)), np.float32),
                                  uv_scale=np.asarray(props.get("uv_scale", (1.0, 1.0)), np.float32),
                                  bezier_p0=np.asarray(props.get("bezier_p0", (0.0, 0.0)), np.float32),
                                  bezier_p2=np.asarray(props.get("bezier_p2", (1.0, 1.0)), np.float32))
        elif ctype == "instanced_model":
            mid = props.get("model")
            mid = self.system.models.get_id(mid) if isinstance(mid, str) else int(mid)
            n = int(props.get("count", 0))
            self.instanced_models[entity] = {
                "model": mid,
                "pos": np.asarray(props.get("positions", np.zeros((n, 3))), np.float32),
                "rot": np.asarray(props.get("rotations", np.tile([0, 0, 0, 1.0], (max(n, 1), 1))), np.float32),
                "scale": np.asarray(props.get("scales", np.ones((max(n, 1), 3))), np.float32),
            }
            self.invalidate_statics()
        elif ctype == "procedural_geometry":
            self.procedural_geometries[entity] = {
                "vertices": np.asarray(props.get("vertices", np.zeros((0, 3))), np.float32),
                "material": int(props.get("material", 0)),
            }
        elif ctype == "reflection_probe":
            self.reflection_probes.add(entity,
                                       size=np.int32(props.get("size", 128)),
                                       half_extents=np.asarray(props.get("half_extents", (10.0,) * 3), np.float32))
        elif ctype == "environment_probe":
            self.environment_probes.add(entity,
                                        inner=np.asarray(props.get("inner", (5.0,) * 3), np.float32),
                                        outer=np.asarray(props.get("outer", (10.0,) * 3), np.float32))
        elif ctype == "bone_attachment":
            self.bone_attachments.add(entity,
                                      parent_entity=np.int32(props.get("parent_entity", -1)),
                                      bone=np.int32(props.get("bone", 0)),
                                      offset_pos=np.asarray(props.get("offset_pos", (0.0,) * 3), np.float32),
                                      offset_rot=np.asarray(props.get("offset_rot", (0, 0, 0, 1.0)), np.float32))
            # the attachment follows the bone in the animated entity's space
            if props.get("parent_entity", -1) >= 0 and self.world.get_parent(entity) < 0:
                self.world.set_parent(entity, int(props["parent_entity"]))
        else:
            raise KeyError(ctype)

    def destroy_component(self, entity: int, ctype: str) -> None:
        self.invalidate_statics()
        if ctype == "particle_emitter":
            self.particle_emitters.pop(f"pe{entity}", None)
            return
        if ctype in ("terrain", "decal", "curve_decal", "reflection_probe",
                     "environment_probe", "bone_attachment"):
            getattr(self, self.COMPONENT_STORES[ctype]).remove(entity)
            return
        if ctype == "instanced_model":
            self.instanced_models.pop(entity, None)
            return
        if ctype == "procedural_geometry":
            self.procedural_geometries.pop(entity, None)
            return
        if ctype == "model_instance":
            self.model_instances.remove(entity)
            self.culling.remove(entity)
        elif ctype == "camera":
            self.cameras.remove(entity)
            if self.active_camera == entity:
                self.active_camera = -1
        elif ctype == "point_light":
            self.point_lights.remove(entity)
        elif ctype == "environment":
            self.env_entity = -1

    def set_model(self, entity: int, model_name: str) -> None:
        self.invalidate_statics()
        mid = self.system.models.get_id(model_name)
        self.model_instances.set(entity, "model", mid)
        self.culling.set_radius(entity, self.system.models.get(mid).bounding_radius)

    # -- serialization (≙ RenderModule::serialize blob) -------------------------

    def serialize_components(self):
        from lumixengine_tpu.utils.store import dump_stores

        out = dump_stores(self)
        if self.env_entity >= 0:
            out.append({"type": "environment", "entity": self.env_entity,
                        "props": {"color": self.env_color.tolist(),
                                  "intensity": float(self.env_intensity)}})
        for key, (entity, ps) in self.particle_emitters.items():
            out.append({"type": "particle_emitter", "entity": entity,
                        "props": {"script": getattr(ps, "script_name", None) or self._script_of(ps)}})
        for e, im in self.instanced_models.items():
            out.append({"type": "instanced_model", "entity": e, "props": {
                "model": im["model"], "count": len(im["pos"]),
                "positions": im["pos"].tolist(), "rotations": im["rot"].tolist(),
                "scales": im["scale"].tolist()}})
        for e, pg in self.procedural_geometries.items():
            out.append({"type": "procedural_geometry", "entity": e, "props": {
                "vertices": pg["vertices"].tolist(), "material": pg["material"]}})
        return out

    def _script_of(self, ps) -> str:
        for name in self.system.particle_scripts:
            if getattr(ps, "script_name", None) == name:
                return name
        # fall back: match by emitter set
        for name, (src, imports) in self.system.particle_scripts.items():
            try:
                if set(self.system.particle_system(name).emitters) == set(ps.emitters):
                    return name
            except Exception:
                continue
        raise ValueError("cannot identify particle script for serialization")

    # -- device state ---------------------------------------------------------

    def device_state(self) -> RenderState:
        w = self.world
        mi = self.model_instances.device(w)
        cam = self.cameras.device(w)
        pl = self.point_lights.device(w)
        k = self.model_instances.capacity
        return RenderState(
            culling=self.culling.device_state(w),
            mi_entity=mi["entity"],
            mi_model=mi["model"],
            mi_visible=jnp.zeros(k, bool),
            mi_lod=jnp.zeros(k, jnp.int32),
            prev_pos=jnp.zeros((3, k), jnp.float32),
            prev_rot=jnp.zeros((4, k), jnp.float32).at[3, :].set(1.0),
            cam_entity=cam["entity"],
            cam_fov=cam["fov"],
            cam_near=cam["near"],
            cam_far=cam["far"],
            cam_aspect=cam["aspect"],
            cam_ortho_size=cam["ortho_size"],
            cam_is_ortho=cam["is_ortho"],
            pl_entity=pl["entity"],
            pl_color=pl["color"].T,
            pl_intensity=pl["intensity"],
            pl_range=pl["range"],
            pl_visible=jnp.zeros(self.point_lights.capacity, bool),
            env_entity=jnp.int32(w.slot(self.env_entity) if self.env_entity >= 0 else -1),
            env_color=jnp.asarray(self.env_color),
            env_intensity=jnp.asarray(self.env_intensity),
            particles={key: ps.device_state() for key, (e, ps) in self.particle_emitters.items()},
            prng=jax.random.PRNGKey(0),
            counters={
                "visible_count": jnp.int32(0),
                "lights_visible": jnp.int32(0),
                "particles_alive": jnp.int32(0),
                "particles_emitted": jnp.int32(0),
                "particles_killed": jnp.int32(0),
            },
        )

    # -- phases ---------------------------------------------------------------

    def end_frame(self, state: WorldState, dt) -> WorldState:
        """Snapshot prev-frame world transforms of model instances for motion
        vectors (≙ render_module.cpp endFrame prev_frame_transform). Uses
        STATIC slot indices (membership is host data) — one static-index
        gather for pos+rot."""
        rs: RenderState = state.modules[self.name]
        eidx = jnp.asarray(np.maximum(self.statics().mi_slots, 0))
        packed = jnp.concatenate([state.world.pos, state.world.rot], axis=-2)  # [..,7,N]
        g = jnp.take(packed, eidx, axis=-1)
        comp = g.ndim - 2
        rs = rs.replace(
            prev_pos=jax.lax.slice_in_dim(g, 0, 3, axis=comp),
            prev_rot=jax.lax.slice_in_dim(g, 3, 7, axis=comp),
        )
        return state.replace(modules={**state.modules, self.name: rs})

    def late_update(self, state: WorldState, dt) -> WorldState:
        """Bone attachments follow animated bones (≙ render_module.cpp pose
        lock/unlock + bone-attachment propagation): attachment local (as a
        child of the animated entity) = bone model-space pose ∘ offset."""
        ba = self.bone_attachments
        if not len(ba):
            return state
        anim = self.world.modules.get("animation")
        if anim is None or "animation" not in state.modules:
            return state
        from lumixengine_tpu.core import math as lm

        ams = state.modules["animation"]
        # static wiring: attachment -> pool column of the animated parent
        cols, bones, eslots, offp, offr = [], [], [], [], []
        for slot in range(ba.capacity):
            e = int(ba.entity[slot])
            if e < 0:
                continue
            parent = int(ba.data["parent_entity"][slot])
            col = -1
            if parent in anim.animables:
                col = anim.pool_col_animable(anim.animables.slot_of(parent))
            elif parent in anim.animators:
                col = anim.pool_col_animator(anim.animators.slot_of(parent))
            if col < 0:
                continue
            cols.append(col)
            bones.append(int(ba.data["bone"][slot]))
            eslots.append(self.world.slot(e))
            offp.append(ba.data["offset_pos"][slot])
            offr.append(ba.data["offset_rot"][slot])
        if not cols:
            return state
        bidx = np.asarray(bones, np.int32)
        cols = np.asarray(cols, np.int32)
        # gather bone (b_k) of pool column (c_k) per attachment (static indices)
        karr = np.arange(len(bones))
        bpos = ams.pose_pos[..., :, bidx, :][..., :, karr, cols]
        brot = ams.pose_rot[..., :, bidx, :][..., :, karr, cols]
        op = jnp.asarray(np.asarray(offp, np.float32).T)
        orot = jnp.asarray(np.asarray(offr, np.float32).T)
        new_lp = bpos + lm.quat_rotate(brot, op, axis=-2)
        new_lr = lm.quat_mul(brot, orot, axis=-2)
        esl = jnp.asarray(np.asarray(eslots, np.int32))
        local = state.local.replace(
            pos=state.local.pos.at[..., :, esl].set(new_lp),
            rot=state.local.rot.at[..., :, esl].set(new_lr),
        )
        return state.replace(local=local)

    def cull_pass(self, state: WorldState, dt) -> WorldState:
        """Convenience: the pipeline's fused cull/LOD pass on camera 0."""
        from lumixengine_tpu.renderer import pipeline as pipe

        return pipe.cull_pass(state, dt, self, statics=self.statics())

    def set_particle_global(self, entity: int, name: str, value) -> None:
        """Set a script `global` for this entity's emitter (≙ Lua setting
        GLOBAL DataStream values). Takes effect at the next step build."""
        self.particle_globals.setdefault(f"pe{entity}", {})[name] = value

    def update(self, state: WorldState, dt) -> WorldState:
        """Tick all particle systems (≙ render_module.cpp update →
        jobs::forEach over ParticleSystems + stats counters)."""
        if not self.particle_emitters:
            return state
        rs: RenderState = state.modules[self.name]
        key = jax.random.fold_in(rs.prng, state.frame)
        particles = dict(rs.particles)
        alive_n = jnp.int32(0)
        emitted_n = jnp.int32(0)
        killed_n = jnp.int32(0)
        for i, (pkey, (entity, ps)) in enumerate(sorted(self.particle_emitters.items())):
            system = dict(self.particle_globals.get(pkey, {}))
            system.setdefault("entity_position",
                              state.world.pos[..., :, self.world.slot(entity)])
            sub = ps.step(particles[pkey], dt, state.time,
                          jax.random.fold_in(key, i), system=system)
            particles[pkey] = sub
            for st in sub.values():
                alive_n = alive_n + jnp.sum(st.alive).astype(jnp.int32)
                emitted_n = emitted_n + st.emitted
                killed_n = killed_n + st.killed
        rs = rs.replace(
            particles=particles,
            counters={
                **rs.counters,
                "particles_alive": alive_n,
                "particles_emitted": emitted_n,
                "particles_killed": killed_n,
            },
        )
        return state.replace(modules={**state.modules, self.name: rs})


class RendererSystem(ISystem):
    """≙ renderer.cpp Renderer — owns model resources; frame pacing is the
    host/device async dispatch (submit next step before blocking on results),
    replacing the reference's 2-in-flight FrameData + frame thread."""

    name = "renderer_system"

    def __init__(self, engine):
        super().__init__(engine)
        from lumixengine_tpu.renderer.material import MaterialRegistry
        from lumixengine_tpu.renderer.terrain import TerrainRegistry

        self.models = ModelRegistry()
        self.materials = MaterialRegistry()
        self.terrains = TerrainRegistry()
        self._bank: Optional[ModelBank] = None
        # particle script sources: name -> (src, imports dict)
        self.particle_scripts: Dict[str, tuple] = {}
        # postprocess/render plugins (≙ renderer.h addPlugin/RenderPlugin)
        self.plugins: list = []

    def add_plugin(self, plugin) -> None:
        self.plugins.append(plugin)

    def remove_plugin(self, plugin) -> None:
        self.plugins.remove(plugin)

    def add_model(self, model: Model) -> int:
        self._bank = None
        return self.models.add(model)

    @property
    def bank(self) -> ModelBank:
        if self._bank is None:
            self._bank = self.models.bake()
        return self._bank

    def add_particle_script(self, name: str, src: str, imports: Optional[Dict[str, str]] = None):
        """Register a .pat particle script (≙ ParticleSystemResource)."""
        self.particle_scripts[name] = (src, imports or {})

    def particle_system(self, script: str, capacity_override=None):
        from lumixengine_tpu.renderer.particle_system import ParticleSystem

        src, imports = self.particle_scripts[script]
        return ParticleSystem.from_source(src, imports=imports,
                                          capacity_override=capacity_override)

    def create_modules(self, world: World) -> RenderModule:
        caps = getattr(self.engine, "module_capacities", {})
        return RenderModule(
            world,
            self,
            max_model_instances=caps.get("model_instances", min(world.capacity, 4096)),
            max_cameras=caps.get("cameras", 4),
            max_point_lights=caps.get("point_lights", 256),
        )
