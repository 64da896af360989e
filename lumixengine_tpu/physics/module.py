"""PhysicsModule + PhysicsSystem (≙ reference src/physics/physics_module.{h,cpp},
physics_system.cpp — a PhysX binding; here the solver is XLA-native, see
ops/physics_ops.py).

Reference component surface: RigidActor (static/dynamic/kinematic + sphere/box/
capsule/convex/trimesh geoms + CCD), Controller (capsule character, manual
gravity), Heightfield, D6/Distance/Hinge/Spherical joints, Vehicles,
InstancedCube/InstancedMesh (physics_module.h). Step order: updateParallel
clamps dt to ≤1/20 s then simulates (physics_module.cpp updateParallel);
update writes actor poses back into World transforms (updateDynamicActors) and
steps character controllers; lateUpdate feeds animator root motion into
controllers. Collision layers filter pairs via a 32x32 matrix; raycast/sweep
queries filter by layer.

This build (round 1): RigidActor with sphere/box geoms (+static ground plane),
dynamic/static/kinematic motion types, layer matrix, distance joints, sleeping,
batched raycasts. Capsules/heightfields/character controllers/vehicles land
next. Physics pose state is authoritative for dynamic actors: update() writes
it back to entity LOCAL transforms (reference writes globals; identical for
root-level actors, which is what the reference's dynamic actors are in
practice).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.core import math as lm
from lumixengine_tpu.engine.plugin import IModule, ISystem
from lumixengine_tpu.engine.world import World, WorldState
from lumixengine_tpu.ops import physics_ops as P
from lumixengine_tpu.utils.store import DenseStore

MOTION_STATIC = 0
MOTION_DYNAMIC = 1
MOTION_KINEMATIC = 2

MAX_LAYERS = 32  # ≙ reference collision layer count


@struct.dataclass
class PhysicsState:
    pos: jnp.ndarray        # f32 [3, NB]
    rot: jnp.ndarray        # f32 [4, NB]
    vel: jnp.ndarray        # f32 [3, NB]
    angvel: jnp.ndarray     # f32 [3, NB]
    sleep: jnp.ndarray      # int32 [NB] calm-frame counter
    counters: Dict[str, jnp.ndarray]


class PhysStatics:
    """Trace-time constants: pair list, incidence matrices, mass properties."""

    def __init__(self, module: "PhysicsModule"):
        w = module.world
        st = module.actors
        nb = st.capacity
        occupied = st.entity >= 0
        motion = np.asarray(st.data["motion"], np.int32)
        self.entity_slots = w.to_slots(st.entity)
        self.shape = np.asarray(st.data["shape"], np.int32)
        self.radius = np.asarray(st.data["radius"], np.float32)
        self.half_extents = np.asarray(st.data["half_extents"], np.float32).T.copy()  # [3,NB]
        self.layer = np.asarray(st.data["layer"], np.int32)
        friction = np.asarray(st.data["friction"], np.float32)
        restitution = np.asarray(st.data["restitution"], np.float32)
        mass = np.asarray(st.data["mass"], np.float32)

        self.dyn_mask = occupied & (motion == MOTION_DYNAMIC)
        self.kin_mask = occupied & (motion != MOTION_DYNAMIC)
        self.inv_mass = np.where(self.dyn_mask, 1.0 / np.maximum(mass, 1e-6), 0.0).astype(np.float32)

        # body-space inverse inertia (diagonal): sphere 2/5·m·r²; box m/12·(e²+e²)
        he = self.half_extents
        ib = np.zeros((3, nb), np.float32)
        for a in range(3):
            b_, c_ = (a + 1) % 3, (a + 2) % 3
            box_i = mass / 12.0 * ((2 * he[b_]) ** 2 + (2 * he[c_]) ** 2)
            sph_i = 0.4 * mass * self.radius**2
            ii = np.where(self.shape == P.SHAPE_BOX, box_i, sph_i)
            ib[a] = np.where(self.dyn_mask, 1.0 / np.maximum(ii, 1e-9), 0.0)
        self.inv_inertia_body = ib

        # static pair list: occupied, not both non-dynamic, layer matrix allows
        lm_ = module.system.layer_matrix
        ii, jj = np.triu_indices(nb, k=1)
        keep = occupied[ii] & occupied[jj]
        keep &= (motion[ii] == MOTION_DYNAMIC) | (motion[jj] == MOTION_DYNAMIC)
        keep &= lm_[self.layer[ii], self.layer[jj]]
        self.pair_a = ii[keep].astype(np.int32)
        self.pair_b = jj[keep].astype(np.int32)

        # contact slot structure → incidence matrices (static)
        self.ground_plane = bool(module.system.ground_plane)
        ppp = module.points_per_pair
        gnd = module.ground_slots_per_body if self.ground_plane else 0
        pair_ba = np.tile(self.pair_a, ppp)
        pair_bb = np.tile(self.pair_b, ppp)
        gnd_ba = np.tile(np.arange(nb, dtype=np.int32), gnd)
        self.contact_body_a = np.concatenate([gnd_ba, pair_ba])
        self.contact_body_b = np.concatenate([np.full(gnd * nb, -1, np.int32), pair_bb])
        c = self.contact_body_a.shape[0]
        inc_a = np.zeros((nb, c), np.float32)
        inc_a[self.contact_body_a, np.arange(c)] = 1.0
        inc_b = np.zeros((nb, c), np.float32)
        valid_b = self.contact_body_b >= 0
        inc_b[np.maximum(self.contact_body_b, 0)[valid_b], np.nonzero(valid_b)[0]] = 1.0
        self.incidence_a = inc_a
        self.incidence_b = inc_b

        # per-contact combined materials (geometric mean friction, max restitution
        # — PhysX default combine modes are multiply/average; we use sqrt-product
        # for friction like PhysX's eCOMBINE_AVERAGE≈, documented)
        fa = friction[self.contact_body_a]
        fb = np.where(valid_b, friction[np.maximum(self.contact_body_b, 0)],
                      module.system.ground_friction)
        self.friction = np.sqrt(np.maximum(fa * fb, 0.0)).astype(np.float32)
        ra = restitution[self.contact_body_a]
        rb = np.where(valid_b, restitution[np.maximum(self.contact_body_b, 0)],
                      module.system.ground_restitution)
        self.restitution = np.maximum(ra, rb).astype(np.float32)

        # distance joints: static endpoint list
        j = module.joints
        jo = j.entity >= 0
        self.joint_a = np.asarray(j.data["body_a"], np.int32)[jo]
        self.joint_b = np.asarray(j.data["body_b"], np.int32)[jo]
        self.joint_len = np.asarray(j.data["length"], np.float32)[jo]


class PhysicsModule(IModule):
    name = "physics"
    COMPONENT_STORES = {"rigid_actor": "actors", "distance_joint": "joints"}

    def __init__(self, world: World, system: "PhysicsSystem",
                 max_actors: int = 256, max_joints: int = 64,
                 points_per_pair: int = 4, ground_slots_per_body: int = 4,
                 solver_iterations: int = 12):
        super().__init__(world, system)
        self.actors = DenseStore(
            max_actors,
            {
                "motion": ((), np.int32, MOTION_STATIC),
                "shape": ((), np.int32, P.SHAPE_SPHERE),
                "radius": ((), np.float32, 0.5),
                "half_extents": ((3,), np.float32, 0.5),
                "mass": ((), np.float32, 1.0),
                "friction": ((), np.float32, 0.5),
                "restitution": ((), np.float32, 0.0),
                "layer": ((), np.int32, 0),
            },
        )
        self.joints = DenseStore(
            max_joints,
            {"body_a": ((), np.int32, -1), "body_b": ((), np.int32, -1),
             # entity ids kept alongside slots so serialization can remap
             "ent_a": ((), np.int32, -1), "ent_b": ((), np.int32, -1),
             "length": ((), np.float32, 1.0)},
        )
        self.points_per_pair = points_per_pair
        self.ground_slots_per_body = ground_slots_per_body
        self.solver_iterations = solver_iterations
        self._statics: Optional[PhysStatics] = None
        self._statics_version = -1

    # -- components ---------------------------------------------------------

    def component_types(self):
        return ["rigid_actor", "distance_joint"]

    def create_component(self, entity: int, ctype: str, **props):
        self.invalidate_statics()
        if ctype == "rigid_actor":
            motion = props.get("motion", "static")
            motion = {"static": MOTION_STATIC, "dynamic": MOTION_DYNAMIC,
                      "kinematic": MOTION_KINEMATIC}.get(motion, motion)
            shape = props.get("shape", "sphere")
            shape = {"sphere": P.SHAPE_SPHERE, "box": P.SHAPE_BOX,
                     "capsule": P.SHAPE_CAPSULE}.get(shape, shape)
            self.actors.add(
                entity,
                motion=np.int32(motion),
                shape=np.int32(shape),
                radius=np.float32(props.get("radius", 0.5)),
                half_extents=np.asarray(props.get("half_extents", (0.5, 0.5, 0.5)), np.float32),
                mass=np.float32(props.get("mass", 1.0)),
                friction=np.float32(props.get("friction", 0.5)),
                restitution=np.float32(props.get("restitution", 0.0)),
                layer=np.int32(props.get("layer", 0)),
            )
        elif ctype == "distance_joint":
            ea, eb = int(props["body_a"]), int(props["body_b"])
            ba = self.actors.slot_of(ea)
            bb = self.actors.slot_of(eb)
            self.joints.add(entity, body_a=np.int32(ba), body_b=np.int32(bb),
                            ent_a=np.int32(ea), ent_b=np.int32(eb),
                            length=np.float32(props.get("length", 1.0)))
        else:
            raise KeyError(ctype)

    def destroy_component(self, entity: int, ctype: str) -> None:
        self.invalidate_statics()
        if ctype == "rigid_actor":
            self.actors.remove(entity)
        elif ctype == "distance_joint":
            self.joints.remove(entity)

    def invalidate_statics(self):
        self._statics = None

    def prepare_statics(self):
        self.world._refresh_levels()
        if (self._statics is None
                or self._statics_version != self.world.topology_version
                or self._statics.ground_plane != bool(self.system.ground_plane)):
            self._statics = PhysStatics(self)
            self._statics_version = self.world.topology_version

    def statics(self) -> PhysStatics:
        self.prepare_statics()
        return self._statics

    # -- device state ---------------------------------------------------------

    def device_state(self) -> PhysicsState:
        st = self.statics()
        nb = self.actors.capacity
        # initial body poses from entity world transforms
        pos = np.zeros((3, nb), np.float32)
        rot = np.tile(np.array([[0.0], [0.0], [0.0], [1.0]], np.float32), (1, nb))
        for slot in range(nb):
            e = int(self.actors.entity[slot])
            if e >= 0:
                p, r, _ = self.world.get_global_transform(e)
                pos[:, slot] = p
                rot[:, slot] = r
        return PhysicsState(
            pos=jnp.asarray(pos),
            rot=jnp.asarray(rot),
            vel=jnp.zeros((3, nb), jnp.float32),
            angvel=jnp.zeros((3, nb), jnp.float32),
            sleep=jnp.zeros(nb, jnp.int32),
            counters={"active_contacts": jnp.int32(0)},
        )

    # -- phases -----------------------------------------------------------------

    def update_parallel(self, state: WorldState, dt) -> WorldState:
        """≙ physics_module.cpp updateParallel: clamp dt ≤ 1/20 s, simulate."""
        st = self.statics()
        ms: PhysicsState = state.modules[self.name]
        sys: PhysicsSystem = self.system

        dt_c = jnp.minimum(jnp.asarray(dt, jnp.float32), 1.0 / 20.0)
        dyn = jnp.asarray(st.dyn_mask)
        # kinematic/static bodies track their entity world transform
        eidx = jnp.asarray(np.maximum(st.entity_slots, 0))
        kin = jnp.asarray(st.kin_mask)[None, :]
        pos = jnp.where(kin, jnp.take(state.world.pos, eidx, axis=-1), ms.pos)
        rot = jnp.where(kin, jnp.take(state.world.rot, eidx, axis=-1), ms.rot)

        vel, angvel = P.integrate_velocities(
            ms.vel, ms.angvel, dt_c, sys.gravity, sys.linear_damping,
            sys.angular_damping, dyn,
        )

        shape = jnp.asarray(st.shape)
        radius = jnp.asarray(st.radius)
        he = jnp.asarray(st.half_extents)
        gc = P.ground_contacts(pos, rot, shape, radius, he, dyn,
                               ground_y=sys.ground_y,
                               slots_per_body=self.ground_slots_per_body) \
            if sys.ground_plane else None
        contacts = None
        if len(st.pair_a):
            contacts = P.pair_contacts(pos, rot, st.shape, radius, he,
                                       st.pair_a, st.pair_b,
                                       points_per_pair=self.points_per_pair)
        if gc is not None and contacts is not None:
            contacts = P.concat_contacts(gc, contacts)
        elif contacts is None:
            contacts = gc

        if contacts is not None:
            iiw = P.inv_inertia_world_diag(rot, jnp.asarray(st.inv_inertia_body))
            vel, angvel = P.solve_contacts(
                pos, rot, vel, angvel, contacts,
                st.inv_mass, iiw, st.incidence_a, st.incidence_b, dt_c,
                st.friction, st.restitution,
                iterations=self.solver_iterations,
            )
            n_active = jnp.sum(contacts.active).astype(jnp.int32)
        else:
            n_active = jnp.int32(0)

        # distance joints: simple velocity-level constraint (≙ PxDistanceJoint)
        if len(st.joint_a):
            vel = self._solve_distance_joints(pos, vel, st, dt_c)

        pos, rot = P.integrate_positions(pos, rot, vel, angvel, dt_c, dyn)
        vel, angvel, sleep, _ = P.update_sleep(vel, angvel, ms.sleep, dyn)

        ms = ms.replace(pos=pos, rot=rot, vel=vel, angvel=angvel, sleep=sleep,
                        counters={**ms.counters, "active_contacts": n_active})
        return state.replace(modules={**state.modules, self.name: ms})

    def _solve_distance_joints(self, pos, vel, st: PhysStatics, dt):
        ja = jnp.asarray(st.joint_a)
        jb = jnp.asarray(st.joint_b)
        pa = jnp.take(pos, ja, axis=-1)
        pb = jnp.take(pos, jb, axis=-1)
        d = pb - pa
        dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-2), 1e-12))
        n = d / dist[..., None, :]
        err = dist - jnp.asarray(st.joint_len)
        im_a = jnp.asarray(st.inv_mass)[ja]
        im_b = jnp.asarray(st.inv_mass)[jb]
        va = jnp.take(vel, ja, axis=-1)
        vb = jnp.take(vel, jb, axis=-1)
        vrel = jnp.sum((vb - va) * n, axis=-2)
        lam = -(vrel + 0.2 * err / dt) / jnp.maximum(im_a + im_b, 1e-9)
        imp = n * lam[..., None, :]
        # static incidence scatter
        nbod = pos.shape[-1]
        inc_a = np.zeros((nbod, len(st.joint_a)), np.float32)
        inc_a[st.joint_a, np.arange(len(st.joint_a))] = 1.0
        inc_b = np.zeros((nbod, len(st.joint_b)), np.float32)
        inc_b[st.joint_b, np.arange(len(st.joint_b))] = 1.0
        dva = -jnp.einsum("nc,...kc->...kn", jnp.asarray(inc_a), imp)
        dvb = jnp.einsum("nc,...kc->...kn", jnp.asarray(inc_b), imp)
        return vel + (dva + dvb) * jnp.asarray(st.inv_mass)[None, :]

    def update(self, state: WorldState, dt) -> WorldState:
        """≙ physics_module.cpp update → updateDynamicActors: write simulated
        poses back into entity transforms (locals; propagation follows)."""
        st = self.statics()
        ms: PhysicsState = state.modules[self.name]
        dyn_cols = np.nonzero(st.dyn_mask)[0].astype(np.int32)  # static, unique
        if dyn_cols.size == 0:
            return state
        eslots = jnp.asarray(st.entity_slots[dyn_cols])
        cols = jnp.asarray(dyn_cols)
        local = state.local.replace(
            pos=state.local.pos.at[..., :, eslots].set(jnp.take(ms.pos, cols, axis=-1)),
            rot=state.local.rot.at[..., :, eslots].set(jnp.take(ms.rot, cols, axis=-1)),
        )
        return state.replace(local=local)

    # -- queries (host-visible, also traceable) ---------------------------------

    def raycast(self, ms: PhysicsState, origin, direction):
        """Batched ray vs actor spheres (box raycast lands with capsules)."""
        st = self.statics()
        mask = jnp.asarray(st.shape == P.SHAPE_SPHERE) & jnp.asarray(
            self.actors.entity >= 0
        )
        return P.raycast_spheres(jnp.asarray(origin), jnp.asarray(direction),
                                 ms.pos, jnp.asarray(st.radius), mask)


class PhysicsSystem(ISystem):
    """≙ physics_system.cpp PhysicsSystem — global config: gravity, collision
    layer matrix, ground plane, damping."""

    name = "physics_system"

    def __init__(self, engine, gravity=(0.0, -9.81, 0.0)):
        super().__init__(engine)
        self.gravity = np.asarray(gravity, np.float32)
        self.layer_matrix = np.ones((MAX_LAYERS, MAX_LAYERS), bool)
        self.ground_plane = True
        self.ground_y = 0.0
        self.ground_friction = 0.6
        self.ground_restitution = 0.0
        self.linear_damping = 0.05
        self.angular_damping = 0.05

    def set_layers_collide(self, a: int, b: int, collide: bool) -> None:
        self.layer_matrix[a, b] = collide
        self.layer_matrix[b, a] = collide

    def create_modules(self, world: World) -> PhysicsModule:
        caps = getattr(self.engine, "module_capacities", {})
        return PhysicsModule(
            world, self,
            max_actors=caps.get("actors", 256),
            max_joints=caps.get("joints", 64),
        )
