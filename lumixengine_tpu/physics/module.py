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

Implemented surface: RigidActor with sphere/box/capsule/convex/SDF-trimesh
geoms across dynamic/static/kinematic motion types; layer matrix; distance/
hinge/spherical/D6 joints (per-axis motions, limits, drives); sleeping; CCD;
batched raycasts (exact for every shape) and sweeps; capsule character
controllers; heightfields; vehicles + wheels. Three broadphase modes chosen by
scene size: dense all-pairs, compacted SAP, and the banded rank-space pipeline
(ops/physics_banded.py) — the default above `sap_threshold`. Physics pose
state is authoritative for dynamic actors: update() writes it back to entity
LOCAL transforms (reference writes globals; identical for root-level actors,
which is what the reference's dynamic actors are in practice).
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
    # character controllers (≙ physics_module.cpp updateControllers)
    ctrl_pos: jnp.ndarray   # f32 [3, C] capsule foot positions
    ctrl_vel_y: jnp.ndarray  # f32 [C] manual gravity integration
    ctrl_disp: jnp.ndarray  # f32 [3, C] pending move() displacement
    ctrl_grounded: jnp.ndarray  # bool [C]
    # accumulated contact impulses carried across frames (PhysX warm starting;
    # see ops/physics_ops.solve_contacts). Shape [C] in allpairs mode, [0] in
    # SAP mode (contact slots change identity every frame there).
    lam_n: jnp.ndarray
    lam_t1: jnp.ndarray
    lam_t2: jnp.ndarray
    # pruned-mode compacted-slot identity: a*NB+b key per budget slot last
    # frame (-1 = empty). Warm lambdas for a slot are zeroed when its pair
    # changed — top-k compaction renumbers slots when the overlap set churns,
    # and stale impulses applied to the wrong pair pop. [0]-sized outside
    # pruned mode.
    pair_key: jnp.ndarray
    # banded-mode warm-start carry (ops/physics_banded.match_warm_lams):
    # pair lambdas per sweep in that sweep's previous rank space, ground-
    # stream lambdas in body order, and the previous body→rank maps that
    # recover pair identity next frame. [0]-sized outside banded mode.
    sap_lam: jnp.ndarray    # f32 [S, 3, k, K, NB]
    sap_glam: jnp.ndarray   # f32 [3, G, NB]
    sap_rank: jnp.ndarray   # int32 [S, NB], -1 ⇒ cold
    # vehicle driver inputs [NV]: throttle (-1..1), steer (radians)
    veh_throttle: jnp.ndarray
    veh_steer: jnp.ndarray
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
        ccd_flags = np.asarray(st.data["ccd"], bool)
        hull_ids = np.asarray(st.data["hull"], np.int32)

        # instanced static actors (InstancedCube/InstancedMesh): extra frozen
        # slots appended past the store capacity — they join every broadphase
        # and the pair narrowphase like any static actor, but never sync from
        # an entity transform (poses frozen at statics build, ≙ the
        # reference's startGame-time PxCreateStatic actors)
        inst = module._expand_instanced()
        self.n_instanced = 0 if inst is None else inst["shape"].shape[0]
        if inst is not None:
            n_i = self.n_instanced
            occupied = np.concatenate([occupied, np.ones(n_i, bool)])
            motion = np.concatenate(
                [motion, np.full(n_i, MOTION_STATIC, np.int32)])
            self.entity_slots = np.concatenate(
                [self.entity_slots,
                 w.to_slots(inst["owner"])]).astype(np.int32)
            self.shape = np.concatenate([self.shape, inst["shape"]])
            self.radius = np.concatenate([self.radius, inst["radius"]])
            self.half_extents = np.concatenate(
                [self.half_extents, inst["half_extents"]], axis=1)
            self.layer = np.concatenate([self.layer, inst["layer"]])
            friction = np.concatenate(
                [friction, np.full(n_i, 0.5, np.float32)])
            restitution = np.concatenate(
                [restitution, np.zeros(n_i, np.float32)])
            mass = np.concatenate([mass, np.ones(n_i, np.float32)])
            ccd_flags = np.concatenate([ccd_flags, np.zeros(n_i, bool)])
            hull_ids = np.concatenate([hull_ids, inst["hull"]])
            self.inst_pos = inst["pos"]     # [3, E] world, frozen
            self.inst_rot = inst["rot"]     # [4, E]
            nb = nb + n_i

        self.nb = nb
        self.occupied = occupied
        self.dyn_mask = occupied & (motion == MOTION_DYNAMIC)
        self.ccd_mask = self.dyn_mask & ccd_flags
        self.has_ccd = bool(self.ccd_mask.any())
        # conservative CCD thickness: sphere/capsule radius, box/hull min extent
        self.ccd_r = np.where(
            self.shape == P.SHAPE_SPHERE, self.radius,
            np.where(self.shape == P.SHAPE_CAPSULE, self.radius,
                     np.abs(self.half_extents).min(axis=0))).astype(np.float32)
        self.kin_mask = occupied & (motion != MOTION_DYNAMIC)
        if self.n_instanced:
            # instanced statics are FROZEN at their materialized pose — they
            # must not track the owning entity's transform like ordinary
            # static/kinematic actors do
            self.kin_mask[-self.n_instanced:] = False
        self.inv_mass = np.where(self.dyn_mask, 1.0 / np.maximum(mass, 1e-6), 0.0).astype(np.float32)
        # per-body materials (SAP mode combines per-contact on device)
        self.friction_body = friction.copy()
        self.restitution_body = restitution.copy()

        # body-space inverse inertia (diagonal): sphere 2/5·m·r²; box
        # m/12·(e²+e²); convex uses the cooked hull inertia scaled to mass
        he = self.half_extents
        self.hull_ids = hull_ids
        is_convex = self.shape == P.SHAPE_CONVEX
        conv_inertia = np.ones((3, nb), np.float32)
        for slot in np.nonzero(occupied & is_convex)[0]:
            h = module.hulls[int(hull_ids[slot])]
            density = mass[slot] / max(h.volume, 1e-9)
            conv_inertia[:, slot] = h.inertia_diag * density
        ib = np.zeros((3, nb), np.float32)
        for a in range(3):
            b_, c_ = (a + 1) % 3, (a + 2) % 3
            box_i = mass / 12.0 * ((2 * he[b_]) ** 2 + (2 * he[c_]) ** 2)
            sph_i = 0.4 * mass * self.radius**2
            ii = np.where(self.shape == P.SHAPE_BOX, box_i,
                          np.where(is_convex, conv_inertia[a], sph_i))
            ib[a] = np.where(self.dyn_mask, 1.0 / np.maximum(ii, 1e-9), 0.0)
        self.inv_inertia_body = ib

        self.ground_plane = bool(module.system.ground_plane)
        self.sap = module.sap_active()

        # -- polytope data (convex narrowphase + SDF candidate points) -------
        # every shape as padded verts + support radius (ops/convex_ops.py)
        self.conv_idx = np.nonzero(occupied & is_convex & self.dyn_mask)[0].astype(np.int32)
        self.has_convex = bool(np.any(occupied & is_convex))
        # SDF mesh colliders: (grid, origin, cell, pos, rot) with poses frozen
        # at statics build (mesh colliders are static environment)
        self.sdf_colliders = []
        mc = module.mesh_colliders
        for slot in range(mc.capacity):
            e = int(mc.entity[slot])
            if e >= 0:
                sdf = module.sdfs[int(mc.data["sdf"][slot])]
                mpos, mrot, _ = module.world.get_global_transform(e)
                self.sdf_colliders.append(
                    (sdf.grid, sdf.origin, float(sdf.cell),
                     np.asarray(mpos, np.float32), np.asarray(mrot, np.float32)))
        need_polytopes = self.has_convex or bool(self.sdf_colliders)
        if need_polytopes:
            vmax, fmax = 8, 3
            for slot in np.nonzero(occupied & is_convex)[0]:
                h = module.hulls[int(hull_ids[slot])]
                vmax = max(vmax, h.verts.shape[0])
                fmax = max(fmax, h.axes.shape[0])
            pv = np.zeros((3, vmax, nb), np.float32)
            pvv = np.zeros((vmax, nb), bool)
            pax = np.zeros((3, fmax, nb), np.float32)
            pax[1, :, :] = 1.0  # padding axis: +Y unit
            prad = np.zeros(nb, np.float32)
            signs = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                              for sz in (-1, 1)], np.float32).T  # [3,8]
            eye3 = np.eye(3, dtype=np.float32)
            for slot in np.nonzero(occupied)[0]:
                sh = int(self.shape[slot])
                if sh == P.SHAPE_BOX:
                    pv[:, :8, slot] = signs * he[:, slot][:, None]
                    pvv[:8, slot] = True
                    pax[:, :3, slot] = eye3
                elif sh == P.SHAPE_SPHERE:
                    pvv[0, slot] = True
                    prad[slot] = self.radius[slot]
                elif sh == P.SHAPE_CAPSULE:
                    hh = he[1, slot]
                    pv[1, 0, slot] = hh
                    pv[1, 1, slot] = -hh
                    pvv[:2, slot] = True
                    prad[slot] = self.radius[slot]
                else:  # convex
                    h = module.hulls[int(hull_ids[slot])]
                    kv, kf = h.verts.shape[0], h.axes.shape[0]
                    pv[:, :kv, slot] = h.verts.T
                    # pad by repeating vert 0 (support-exact, no mask needed)
                    pv[:, kv:, slot] = h.verts.T[:, :1]
                    pvv[:h.n_verts, slot] = True
                    pax[:, :kf, slot] = h.axes.T
                    pax[:, kf:, slot] = h.axes.T[:, :1]
            self.poly_verts = pv
            self.poly_vert_valid = pvv
            self.poly_axes = pax
            self.poly_rad = prad
            # support intervals per face axis (exact convex raycasts):
            # hull lies within [lo, hi] along each of its axes
            dots = np.einsum("cfn,cvn->fvn", pax, pv)
            big = 1e9
            lo = np.where(pvv[None, :, :], dots, big).min(axis=1) - prad[None, :]
            hi = np.where(pvv[None, :, :], dots, -big).max(axis=1) + prad[None, :]
            self.poly_axis_lo = lo.astype(np.float32)
            self.poly_axis_hi = hi.astype(np.float32)
            self.dyn_idx = np.nonzero(self.dyn_mask)[0].astype(np.int32)
        else:
            self.dyn_idx = np.zeros(0, np.int32)

        if self.sap:
            # dynamic broadphase (ops/physics_big.sap_pairs) — no static pair
            # list; incidence/per-contact materials are computed on device.
            # Convex actors degrade to their bounding sphere in SAP pairs.
            self.pair_a = np.zeros(0, np.int32)
            self.pair_b = np.zeros(0, np.int32)
            self.conv_pair_a = np.zeros(0, np.int32)
            self.conv_pair_b = np.zeros(0, np.int32)
        else:
            # static pair list: occupied, not both non-dynamic, layer matrix allows
            lm_ = module.system.layer_matrix
            ii, jj = np.triu_indices(nb, k=1)
            keep = occupied[ii] & occupied[jj]
            keep &= (motion[ii] == MOTION_DYNAMIC) | (motion[jj] == MOTION_DYNAMIC)
            keep &= lm_[self.layer[ii], self.layer[jj]]
            # pairs involving a convex go through the polytope narrowphase
            cvx = is_convex[ii] | is_convex[jj]
            self.pair_a = ii[keep & ~cvx].astype(np.int32)
            self.pair_b = jj[keep & ~cvx].astype(np.int32)
            self.conv_pair_a = ii[keep & cvx].astype(np.int32)
            self.conv_pair_b = jj[keep & cvx].astype(np.int32)

        # pruned broadphase: candidate list stays static; AABB-overlapping
        # pairs are compacted into a fixed budget on device each step
        self.pruned = (not self.sap) and (
            module.broadphase == "pruned"
            or (module.broadphase == "auto"
                and len(self.pair_a) > module.pruned_threshold))
        if self.pruned:
            budget = module.pair_budget or max(
                128, 6 * int(np.sum(self.dyn_mask)))
            self.pair_budget = int(min(budget, len(self.pair_a)))

        if not self.sap:
            # contact slot structure → incidence matrices (static). Slot order
            # MUST match update_parallel's concat: [ground | simple pairs |
            # convex pairs | convex ground | sdf streams]; in pruned mode the
            # simple-pair slots are NOT static — the compacted pair stream is
            # appended LAST at runtime with device-built incidence columns
            ppp = module.points_per_pair
            gnd = module.ground_slots_per_body \
                if (self.ground_plane or module.heightfields.entity.max() >= 0) else 0
            gnd_ba = np.tile(np.arange(nb, dtype=np.int32), gnd)
            if self.pruned:
                parts_a = [gnd_ba, np.tile(self.conv_pair_a, ppp)]
                parts_b = [np.full(gnd * nb, -1, np.int32),
                           np.tile(self.conv_pair_b, ppp)]
            else:
                parts_a = [gnd_ba, np.tile(self.pair_a, ppp),
                           np.tile(self.conv_pair_a, ppp)]
                parts_b = [np.full(gnd * nb, -1, np.int32),
                           np.tile(self.pair_b, ppp),
                           np.tile(self.conv_pair_b, ppp)]
            if self.has_convex and self.ground_plane:
                kg = module.ground_slots_per_body
                parts_a.append(np.tile(self.conv_idx, kg))
                parts_b.append(np.full(len(self.conv_idx) * kg, -1, np.int32))
            if self.sdf_colliders:
                v_slots = self.poly_verts.shape[1]
                for _ in self.sdf_colliders:
                    parts_a.append(np.tile(self.dyn_idx, v_slots))
                    parts_b.append(np.full(len(self.dyn_idx) * v_slots, -1, np.int32))
            self.contact_body_a = np.concatenate(parts_a)
            self.contact_body_b = np.concatenate(parts_b)
            c = self.contact_body_a.shape[0]
            inc_a = np.zeros((nb, c), np.float32)
            inc_a[self.contact_body_a, np.arange(c)] = 1.0
            inc_b = np.zeros((nb, c), np.float32)
            valid_b = self.contact_body_b >= 0
            inc_b[np.maximum(self.contact_body_b, 0)[valid_b], np.nonzero(valid_b)[0]] = 1.0
            self.incidence_a = inc_a
            self.incidence_b = inc_b

            # per-contact combined materials (geometric mean friction, max
            # restitution — PhysX default combine modes are multiply/average;
            # we use sqrt-product for friction like PhysX's eCOMBINE_AVERAGE≈)
            fa = friction[self.contact_body_a]
            fb = np.where(valid_b, friction[np.maximum(self.contact_body_b, 0)],
                          module.system.ground_friction)
            self.friction = np.sqrt(np.maximum(fa * fb, 0.0)).astype(np.float32)
            ra = restitution[self.contact_body_a]
            rb = np.where(valid_b, restitution[np.maximum(self.contact_body_b, 0)],
                          module.system.ground_restitution)
            self.restitution = np.maximum(ra, rb).astype(np.float32)

            # total slot count incl. the runtime-compacted pair slots (warm-
            # start lambda arrays are sized to this)
            self.n_contact_slots = c + (
                ppp * self.pair_budget if self.pruned else 0)

        # joints: static endpoint lists (by type)
        j = module.joints
        jo = j.entity >= 0
        jt = np.asarray(j.data["jtype"], np.int32)[jo]
        self.joint_a = np.asarray(j.data["body_a"], np.int32)[jo]
        self.joint_b = np.asarray(j.data["body_b"], np.int32)[jo]
        self.joint_len = np.asarray(j.data["length"], np.float32)[jo]
        self.joint_type = jt
        self.joint_anchor_a = np.asarray(j.data["anchor_a"], np.float32)[jo].T.copy()
        self.joint_anchor_b = np.asarray(j.data["anchor_b"], np.float32)[jo].T.copy()
        self.joint_axis = np.asarray(j.data["axis"], np.float32)[jo].T.copy()
        self.joint_min_dist = np.asarray(j.data["min_distance"], np.float32)[jo]
        self.joint_max_dist = np.asarray(j.data["max_distance"], np.float32)[jo]
        self.joint_limit_on = np.asarray(j.data["limit_on"], np.int32)[jo]
        self.joint_limit_min = np.asarray(j.data["limit_min"], np.float32)[jo]
        self.joint_limit_max = np.asarray(j.data["limit_max"], np.float32)[jo]
        self.joint_drive_on = np.asarray(j.data["drive_on"], np.int32)[jo]
        self.joint_drive_vel = np.asarray(j.data["drive_velocity"], np.float32)[jo]
        self.joint_drive_force = np.asarray(j.data["drive_force"], np.float32)[jo]
        self.joint_rest_rel = np.asarray(j.data["rest_rel_rot"], np.float32)[jo].T.copy()
        # d6 per-axis motions (frame-A axes); non-d6 point joints lock all
        # linear axes and no angular axes
        lin = np.asarray(j.data["d6_linear"], np.int32)[jo].T.copy()   # [3,NJ]
        ang_ = np.asarray(j.data["d6_angular"], np.int32)[jo].T.copy()
        is_d6 = (jt == 3)
        self.joint_lin_mask = np.where(is_d6[None, :], lin, 1).astype(np.float32)
        self.joint_ang_mask = np.where(is_d6[None, :], ang_, 0).astype(np.float32)
        self.has_d6_config = bool(is_d6.any() and (
            (lin[:, is_d6] == 0).any() or (ang_[:, is_d6] == 1).any()))

        # controllers
        c = module.controllers
        co = c.entity >= 0
        self.ctrl_mask = co
        self.ctrl_entity_slots = w.to_slots(c.entity)
        self.ctrl_radius = np.asarray(c.data["radius"], np.float32)
        self.ctrl_height = np.asarray(c.data["height"], np.float32)
        self.ctrl_gravity = np.asarray(c.data["gravity"], np.float32)

        # vehicles + wheels (≙ PxVehicle batch update: physics_module.cpp
        # updateVehicles) — raycast-suspension params as static arrays
        v = module.vehicles
        vo = v.entity >= 0
        self.veh_mask = vo
        self.veh_body = np.asarray(v.data["body"], np.int32)
        self.veh_torque = np.asarray(v.data["peak_torque"], np.float32)
        wh = module.wheels
        wo = wh.entity >= 0
        wveh = np.full(wh.capacity, -1, np.int32)
        for i in range(wh.capacity):
            if wo[i]:
                ve = int(wh.data["vehicle_ent"][i])
                sv = module.vehicles.slot_of(ve)
                wveh[i] = sv
        self.wheel_mask = wo & (wveh >= 0)
        self.wheel_vehicle = np.maximum(wveh, 0)
        self.wheel_body = np.where(
            self.wheel_mask, self.veh_body[self.wheel_vehicle], 0).astype(np.int32)
        self.wheel_radius = np.asarray(wh.data["radius"], np.float32)
        self.wheel_droop = np.asarray(wh.data["max_droop"], np.float32)
        self.wheel_comp = np.asarray(wh.data["max_compression"], np.float32)
        self.wheel_spring = np.asarray(wh.data["spring_strength"], np.float32)
        self.wheel_damper = np.asarray(wh.data["spring_damper_rate"], np.float32)
        self.wheel_slot = np.asarray(wh.data["slot"], np.int32)
        self.wheel_anchor = np.asarray(wh.data["anchor"], np.float32).T.copy()  # [3,NW]
        self.has_vehicles = bool(self.wheel_mask.any())

        # heightfield (first one wins; terrain bank from the renderer system)
        self.heightfield_terrain = -1
        self.heightfield_origin = (0.0, 0.0, 0.0)
        hf = module.heightfields
        for slot in range(hf.capacity):
            e = int(hf.entity[slot])
            if e >= 0:
                self.heightfield_terrain = int(hf.data["terrain"][slot])
                self.heightfield_origin = tuple(
                    float(x) for x in module.world.get_global_transform(e)[0]
                )
                break


class PhysicsModule(IModule):
    name = "physics"
    COMPONENT_STORES = {"rigid_actor": "actors", "distance_joint": "joints",
                        "physics_controller": "controllers",
                        "heightfield": "heightfields"}

    def __init__(self, world: World, system: "PhysicsSystem",
                 max_actors: int = 256, max_joints: int = 64,
                 points_per_pair: int = 4, ground_slots_per_body: int = 4,
                 solver_iterations: int = 10, position_iterations: int = 3,
                 broadphase: str = "auto",
                 sap_neighbors: int = 16, sap_threshold: int = 256,
                 sap_sweeps: int = 4,
                 solver_backend: str = "auto",
                 pair_budget: Optional[int] = None,
                 pruned_threshold: int = 192,
                 pruned_margin: float = 0.05):
        super().__init__(world, system)
        # broadphase: "allpairs" (static pair list + incidence matmuls — the
        # small-NB fast path), "sap" (sweep-and-prune window, scales to 10k+
        # actors, ≙ PhysX SAP), or "auto" (sap above sap_threshold actors)
        self.broadphase = broadphase
        self.sap_neighbors = sap_neighbors
        self.sap_threshold = sap_threshold
        # banded-mode sweep count (ops/physics_banded.sweep_orders): 1 =
        # classic min-x SAP (exact only under K-bounded x-density), 4 =
        # guaranteed-coverage cell-column sweeps (the default — dense piles
        # keep every overlapping pair inside some sweep's window), 5 adds the
        # classic sweep for heterogeneous-size scenes
        self.sap_sweeps = sap_sweeps
        # banded-mode cross-frame impulse carry (match_warm_lams); off is
        # only for A/B debugging against the cold-start legacy paths
        self.warm_starting = True
        # "auto": fused Pallas PGS on TPU, jnp oracle elsewhere;
        # "pallas"/"jnp" force (see update_parallel dispatch)
        self.solver_backend = solver_backend
        # pruned broadphase (the mid-scale sweet spot between the static
        # all-pairs incidence path and SAP): keep the static candidate list,
        # but each step compact the AABB-overlapping pairs into a fixed
        # `pair_budget` via top_k and solve only those — C-sized solver
        # traffic shrinks by the candidate/overlap ratio while keeping the
        # incidence-matmul solver (no segment_sum scatter). Auto-enabled when
        # the candidate list exceeds `pruned_threshold` pairs.
        self.pair_budget = pair_budget
        self.pruned_threshold = pruned_threshold
        self.pruned_margin = pruned_margin
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
                "hull": ((), np.int32, -1),  # index into self.hulls (convex)
                # ≙ PxRigidBodyFlag::eENABLE_CCD: swept clamping against the
                # static environment for fast movers (see _ccd_clamp)
                "ccd": ((), np.bool_, False),
            },
        )
        self.joints = DenseStore(
            max_joints,
            {"body_a": ((), np.int32, -1), "body_b": ((), np.int32, -1),
             # entity ids kept alongside slots so serialization can remap
             "ent_a": ((), np.int32, -1), "ent_b": ((), np.int32, -1),
             # 0=distance 1=spherical(ball) 2=hinge 3=d6 (≙ physics_module.h joints)
             "jtype": ((), np.int32, 0),
             "length": ((), np.float32, 1.0),
             # distance joint min/max (≙ PxDistanceJoint min/maxDistance);
             # max<=0 means use `length` as both
             "min_distance": ((), np.float32, 0.0),
             "max_distance": ((), np.float32, 0.0),
             "anchor_a": ((3,), np.float32, 0.0),
             "anchor_b": ((3,), np.float32, 0.0),
             "axis": ((3,), np.float32, (0.0, 1.0, 0.0)),
             # hinge limits/drive (≙ PxRevoluteJoint AngularLimitPair +
             # drive velocity/force limit); limit_on/drive_on as 0/1
             "limit_on": ((), np.int32, 0),
             "limit_min": ((), np.float32, 0.0),
             "limit_max": ((), np.float32, 0.0),
             "drive_on": ((), np.int32, 0),
             "drive_velocity": ((), np.float32, 0.0),
             "drive_force": ((), np.float32, 1e9),
             # rest relative rotation captured at creation (hinge angle ref)
             "rest_rel_rot": ((4,), np.float32, (0.0, 0.0, 0.0, 1.0)),
             # d6 per-axis motion config in the joint (frame-A) axes
             # (≙ PxD6Joint setMotion): 1 = locked, 0 = free
             "d6_linear": ((3,), np.int32, 1),
             "d6_angular": ((3,), np.int32, 0)},
        )
        # capsule character controllers (custom gravity, ≙ Controller component)
        self.controllers = DenseStore(
            32,
            {"radius": ((), np.float32, 0.4), "height": ((), np.float32, 1.8),
             "gravity": ((), np.float32, -9.81)},
        )
        # heightfield terrain collision (≙ Heightfield component)
        self.heightfields = DenseStore(4, {"terrain": ((), np.int32, -1)})
        # cooked convex hulls (≙ PxConvexMesh registry; physics_system.cpp
        # cookConvex) — actors reference by index via their "hull" field
        self.hulls: list = []
        # static triangle-mesh colliders as baked SDF grids (≙ PxTriangleMesh
        # via cookTriMesh; representation is PhysX-5-style SDF)
        self.mesh_colliders = DenseStore(4, {"sdf": ((), np.int32, -1)})
        self.sdfs: list = []
        # vehicles + wheels (≙ physics_module.cpp PxVehicle binding; here a
        # raycast-suspension model: spring/damper per wheel, engine torque,
        # front steering, lateral grip — same capability, XLA-native)
        self.vehicles = DenseStore(
            8,
            {"mass": ((), np.float32, 1500.0),
             "center_of_mass": ((3,), np.float32, 0.0),
             "moi_multiplier": ((), np.float32, 1.0),
             "chassis_layer": ((), np.int32, 0),
             "wheels_layer": ((), np.int32, 0),
             "peak_torque": ((), np.float32, 500.0),
             "max_rpm": ((), np.float32, 6000.0),
             "body": ((), np.int32, -1)},   # chassis actor slot
        )
        self.wheels = DenseStore(
            32,
            {"vehicle_ent": ((), np.int32, -1),
             "radius": ((), np.float32, 0.35),
             "width": ((), np.float32, 0.2),
             "mass": ((), np.float32, 20.0),
             "moi": ((), np.float32, 1.0),
             "max_droop": ((), np.float32, 0.15),
             "max_compression": ((), np.float32, 0.15),
             "spring_strength": ((), np.float32, 30000.0),
             "spring_damper_rate": ((), np.float32, 4000.0),
             # 0=FL 1=FR 2=RL 3=RR (≙ WheelSlot)
             "slot": ((), np.int32, 0),
             "anchor": ((3,), np.float32, 0.0)},  # chassis-local attach point
        )
        # instanced static collision (≙ physics_module.h:342,349
        # //@ component InstancedCube / InstancedMesh): one static actor per
        # render InstancedModel instance, materialized as extra frozen static
        # slots at statics build (≙ initInstancedCubes/initInstancedMeshes,
        # physics_module.cpp:2173-2244)
        self.instanced_cubes: Dict[int, dict] = {}
        self.instanced_meshes: Dict[int, dict] = {}
        self._inst_hull_cache: Dict[tuple, int] = {}
        self.points_per_pair = points_per_pair
        self.ground_slots_per_body = ground_slots_per_body
        self.solver_iterations = solver_iterations
        # split-impulse position projection (≙ PhysX TGS position iterations)
        self.position_iterations = position_iterations
        self._statics: Optional[PhysStatics] = None
        self._statics_version = -1

    # -- components ---------------------------------------------------------

    def component_types(self):
        return ["rigid_actor", "distance_joint", "spherical_joint",
                "hinge_joint", "d6_joint", "physics_controller", "heightfield",
                "vehicle", "wheel", "mesh_collider", "instanced_cube",
                "instanced_mesh"]

    def register_hull(self, cooked) -> int:
        """Register a CookedHull (physics/cooking.py) → hull id."""
        self.hulls.append(cooked)
        return len(self.hulls) - 1

    def register_mesh_sdf(self, cooked) -> int:
        """Register a CookedMeshSDF → sdf id."""
        self.sdfs.append(cooked)
        return len(self.sdfs) - 1

    def create_component(self, entity: int, ctype: str, **props):
        self.invalidate_statics()
        if ctype == "rigid_actor":
            motion = props.get("motion", "static")
            motion = {"static": MOTION_STATIC, "dynamic": MOTION_DYNAMIC,
                      "kinematic": MOTION_KINEMATIC}.get(motion, motion)
            shape = props.get("shape", "sphere")
            shape = {"sphere": P.SHAPE_SPHERE, "box": P.SHAPE_BOX,
                     "capsule": P.SHAPE_CAPSULE,
                     "convex": P.SHAPE_CONVEX}.get(shape, shape)
            radius = float(props.get("radius", 0.5))
            he = np.asarray(props.get("half_extents", (0.5, 0.5, 0.5)), np.float32)
            hull_id = -1
            if shape == P.SHAPE_CONVEX:
                # accept a pre-cooked hull, a registered id, or raw points
                hull = props.get("hull")
                if hull is None:
                    from lumixengine_tpu.physics.cooking import cook_convex_cached
                    hull = cook_convex_cached(props["points"])
                if isinstance(hull, int):
                    hull_id = hull
                    hull = self.hulls[hull_id]
                else:
                    hull_id = self.register_hull(hull)
                # bounding data for broadphase AABBs / SAP-mode fallback
                radius = hull.bound_radius
                he = (np.abs(hull.verts).max(axis=0)).astype(np.float32)
            self.actors.add(
                entity,
                motion=np.int32(motion),
                shape=np.int32(shape),
                radius=np.float32(radius),
                half_extents=he,
                mass=np.float32(props.get("mass", 1.0)),
                friction=np.float32(props.get("friction", 0.5)),
                restitution=np.float32(props.get("restitution", 0.0)),
                layer=np.int32(props.get("layer", 0)),
                hull=np.int32(hull_id),
                ccd=np.bool_(props.get("ccd", False)),
            )
        elif ctype in ("distance_joint", "spherical_joint", "hinge_joint", "d6_joint"):
            jtype = {"distance_joint": 0, "spherical_joint": 1,
                     "hinge_joint": 2, "d6_joint": 3}[ctype]
            ea, eb = int(props["body_a"]), int(props["body_b"])
            ba = self.actors.slot_of(ea)
            bb = self.actors.slot_of(eb)
            # rest relative rotation for hinge angle measurement
            _, ra_, _ = self.world.get_global_transform(ea)
            _, rb_, _ = self.world.get_global_transform(eb)
            from lumixengine_tpu.core import host_math as hm
            rest = hm.quat_mul(hm.quat_conjugate(ra_), rb_)
            self.joints.add(entity, body_a=np.int32(ba), body_b=np.int32(bb),
                            ent_a=np.int32(ea), ent_b=np.int32(eb),
                            jtype=np.int32(jtype),
                            length=np.float32(props.get("length", 1.0)),
                            min_distance=np.float32(props.get("min_distance", 0.0)),
                            max_distance=np.float32(props.get("max_distance", 0.0)),
                            anchor_a=np.asarray(props.get("anchor_a", (0.0,) * 3), np.float32),
                            anchor_b=np.asarray(props.get("anchor_b", (0.0,) * 3), np.float32),
                            axis=np.asarray(props.get("axis", (0.0, 1.0, 0.0)), np.float32),
                            limit_on=np.int32(1 if "limit" in props else 0),
                            limit_min=np.float32(props.get("limit", (0.0, 0.0))[0]),
                            limit_max=np.float32(props.get("limit", (0.0, 0.0))[1]),
                            drive_on=np.int32(1 if "drive_velocity" in props else 0),
                            drive_velocity=np.float32(props.get("drive_velocity", 0.0)),
                            drive_force=np.float32(props.get("drive_force", 1e9)),
                            rest_rel_rot=np.asarray(rest, np.float32),
                            d6_linear=np.asarray(
                                props.get("linear_motion", (1, 1, 1)), np.int32),
                            d6_angular=np.asarray(
                                props.get("angular_motion", (0, 0, 0)), np.int32))
        elif ctype == "physics_controller":
            self.controllers.add(entity,
                                 radius=np.float32(props.get("radius", 0.4)),
                                 height=np.float32(props.get("height", 1.8)),
                                 gravity=np.float32(props.get("gravity", -9.81)))
        elif ctype == "heightfield":
            self.heightfields.add(entity, terrain=np.int32(props.get("terrain", 0)))
        elif ctype == "mesh_collider":
            # static triangle-mesh collider (≙ RigidActor with a trimesh geom,
            # physics_system.cpp cookTriMesh); pose = the entity's transform
            sdf = props.get("sdf")
            if sdf is None:
                from lumixengine_tpu.physics.cooking import cook_mesh_sdf_cached
                sdf = cook_mesh_sdf_cached(props["vertices"], props["triangles"],
                                           resolution=int(props.get("resolution", 32)))
            sdf_id = sdf if isinstance(sdf, int) else self.register_mesh_sdf(sdf)
            self.mesh_colliders.add(entity, sdf=np.int32(sdf_id))
        elif ctype == "vehicle":
            # the chassis is a dynamic box actor on the same entity — created
            # implicitly if absent (≙ PxVehicle building its own PxRigidDynamic)
            if self.actors.slot_of(entity) < 0:
                self.create_component(entity, "rigid_actor", motion="dynamic",
                                      shape="box",
                                      half_extents=props.get("chassis_half_extents", (1.0, 0.5, 2.0)),
                                      mass=props.get("mass", 1500.0),
                                      layer=props.get("chassis_layer", 0))
            self.vehicles.add(
                entity,
                mass=np.float32(props.get("mass", 1500.0)),
                center_of_mass=np.asarray(props.get("center_of_mass", (0.0,) * 3), np.float32),
                moi_multiplier=np.float32(props.get("moi_multiplier", 1.0)),
                chassis_layer=np.int32(props.get("chassis_layer", 0)),
                wheels_layer=np.int32(props.get("wheels_layer", 0)),
                peak_torque=np.float32(props.get("peak_torque", 500.0)),
                max_rpm=np.float32(props.get("max_rpm", 6000.0)),
                body=np.int32(self.actors.slot_of(entity)),
            )
        elif ctype == "wheel":
            # wheel entities are children of the vehicle entity; the chassis-
            # local anchor is the wheel's local transform at creation
            veh = int(props.get("vehicle", self.world.get_parent(entity)))
            anchor = np.asarray(self.world.local_pos[entity], np.float32)
            self.wheels.add(
                entity,
                vehicle_ent=np.int32(veh),
                radius=np.float32(props.get("radius", 0.35)),
                width=np.float32(props.get("width", 0.2)),
                mass=np.float32(props.get("mass", 20.0)),
                moi=np.float32(props.get("moi", 1.0)),
                max_droop=np.float32(props.get("max_droop", 0.15)),
                max_compression=np.float32(props.get("max_compression", 0.15)),
                spring_strength=np.float32(props.get("spring_strength", 30000.0)),
                spring_damper_rate=np.float32(props.get("spring_damper_rate", 4000.0)),
                slot=np.int32(props.get("slot", 0)),
                anchor=anchor,
            )
        elif ctype == "instanced_cube":
            # ≙ //@ component InstancedCube id physical_instanced_cube
            # (physics_module.h:342): one static box per render InstancedModel
            # instance, half-extents scaled by the instance scale
            self.instanced_cubes[entity] = {
                "half_extents": np.asarray(
                    props.get("half_extents", (0.5, 0.5, 0.5)), np.float32),
                "layer": int(props.get("layer", 0))}
        elif ctype == "instanced_mesh":
            # ≙ //@ component InstancedMesh id physical_instanced_mesh
            # (physics_module.h:349): one static cooked-convex actor per
            # instance (reference prefers the cooked convex_mesh of the .phy
            # resource, physics_module.cpp:2233-2237); `mesh` names the model
            # whose geometry to cook — empty means the render instanced model
            self.instanced_meshes[entity] = {
                "mesh": props.get("mesh", ""),
                "layer": int(props.get("layer", 0))}
        else:
            raise KeyError(ctype)

    def destroy_component(self, entity: int, ctype: str) -> None:
        self.invalidate_statics()
        if ctype == "rigid_actor":
            self.actors.remove(entity)
        elif ctype in ("distance_joint", "spherical_joint", "hinge_joint", "d6_joint"):
            self.joints.remove(entity)
        elif ctype == "physics_controller":
            self.controllers.remove(entity)
        elif ctype == "heightfield":
            self.heightfields.remove(entity)
        elif ctype == "vehicle":
            self.vehicles.remove(entity)
        elif ctype == "wheel":
            self.wheels.remove(entity)
        elif ctype == "mesh_collider":
            self.mesh_colliders.remove(entity)
        elif ctype == "instanced_cube":
            self.instanced_cubes.pop(entity, None)
        elif ctype == "instanced_mesh":
            self.instanced_meshes.pop(entity, None)

    def serialize(self):
        """Module-level blob (world save "extra" section): the collision
        layer matrix + layer names, so the physics editor's layer edits
        persist through save/load (≙ PhysicsSystem's serialized collision
        layers; physics/editor/physics_plugins.cpp layer matrix UI)."""
        sys = self.system
        out = {}
        if sys is not None:
            # pack each row as a 32-bit mask (rows are MAX_LAYERS wide)
            bits = (np.asarray(sys.layer_matrix, bool)
                    @ (1 << np.arange(sys.layer_matrix.shape[1],
                                      dtype=np.int64))).tolist()
            out["layer_matrix_rows"] = bits
            if hasattr(sys, "layer_names"):
                out["layer_names"] = list(sys.layer_names)
        return out

    def deserialize(self, blob, entity_map) -> None:
        sys = self.system
        rows = (blob or {}).get("layer_matrix_rows")
        if sys is None or not rows:
            return
        n = sys.layer_matrix.shape[1]
        m = np.zeros_like(sys.layer_matrix)
        for r, bits in enumerate(rows[:m.shape[0]]):
            m[r] = (int(bits) >> np.arange(n)) & 1
        sys.layer_matrix = m.astype(bool)
        if "layer_names" in blob:
            sys.layer_names = list(blob["layer_names"])
        self.invalidate_statics()

    def serialize_components(self):
        from lumixengine_tpu.utils.store import dump_stores

        out = dump_stores(self)
        for e, r in self.instanced_cubes.items():
            out.append({"type": "instanced_cube", "entity": e, "props": {
                "half_extents": r["half_extents"].tolist(),
                "layer": r["layer"]}})
        for e, r in self.instanced_meshes.items():
            out.append({"type": "instanced_mesh", "entity": e,
                        "props": dict(r)})
        return out

    def _expand_instanced(self):
        """Materialize instanced static actors: for every instanced_cube /
        instanced_mesh component whose entity also carries a render
        InstancedModel, one frozen static actor per instance (≙
        initInstancedCubes/initInstancedMeshes, physics_module.cpp:2173-2244:
        instance pose = owner translation + instance offset with
        owner_rot·instance_rot; cube half-extents and cooked mesh geometry
        scale by the per-instance scale). Returns None or a dict of
        column-stacked arrays for PhysStatics to append as extra slots."""
        rmod = self.world.modules.get("renderer")
        if rmod is None or not (self.instanced_cubes or self.instanced_meshes):
            return None
        from lumixengine_tpu.core import host_math as hm

        rows = []   # (pos3, rot4, shape, radius, he3, layer, hull_id, owner)

        def instances_of(e):
            im = getattr(rmod, "instanced_models", {}).get(e)
            if im is None or not len(im["pos"]):
                return None
            opos, orot, _ = self.world.get_global_transform(e)
            return im, np.asarray(opos, np.float32), np.asarray(orot, np.float32)

        for e, rec in self.instanced_cubes.items():
            got = instances_of(e)
            if got is None:
                continue
            im, opos, orot = got
            for i in range(len(im["pos"])):
                he = rec["half_extents"] * im["scale"][i]
                rows.append((opos + im["pos"][i],
                             hm.quat_mul(orot, im["rot"][i]),
                             P.SHAPE_BOX, float(np.linalg.norm(he)), he,
                             rec["layer"], -1, e))
        for e, rec in self.instanced_meshes.items():
            got = instances_of(e)
            if got is None:
                continue
            im, opos, orot = got
            # the reference binds a cooked .phy PhysicsGeometry; here `mesh`
            # names a registered model — unresolvable names (e.g. raw .phy
            # paths) fall back to the render instanced model's geometry
            mid = int(im["model"])
            if rec["mesh"]:
                try:
                    mid = rmod.system.models.get_id(rec["mesh"])
                except KeyError:
                    pass
            model = rmod.system.models.get(int(mid))
            pts = getattr(model, "vertex_positions", None)
            if pts is None or not len(pts):
                continue
            from lumixengine_tpu.physics.cooking import cook_convex_cached
            for i in range(len(im["pos"])):
                s = np.asarray(im["scale"][i], np.float32)
                key = (int(mid), tuple(np.round(s, 6).tolist()))
                hid = self._inst_hull_cache.get(key)
                if hid is None:
                    hid = self.register_hull(
                        cook_convex_cached(np.asarray(pts, np.float32) * s))
                    self._inst_hull_cache[key] = hid
                hull = self.hulls[hid]
                he = np.abs(hull.verts).max(axis=0).astype(np.float32)
                rows.append((opos + im["pos"][i],
                             hm.quat_mul(orot, im["rot"][i]),
                             P.SHAPE_CONVEX, float(hull.bound_radius), he,
                             rec["layer"], hid, e))
        if not rows:
            return None
        return {
            "pos": np.stack([r[0] for r in rows], axis=1).astype(np.float32),
            "rot": np.stack([r[1] for r in rows], axis=1).astype(np.float32),
            "shape": np.asarray([r[2] for r in rows], np.int32),
            "radius": np.asarray([r[3] for r in rows], np.float32),
            "half_extents": np.stack([r[4] for r in rows], axis=1).astype(np.float32),
            "layer": np.asarray([r[5] for r in rows], np.int32),
            "hull": np.asarray([r[6] for r in rows], np.int32),
            "owner": np.asarray([r[7] for r in rows], np.int32),
        }

    def sap_active(self) -> bool:
        """True for the LARGE-world modes (dynamic pairs, no static slot
        structure): banded rank-space (default) or segment_sum SAP."""
        if self.broadphase == "auto":
            return self.actors.capacity > self.sap_threshold
        return self.broadphase in ("sap", "banded")

    def _banded_ground_slots(self, st: PhysStatics) -> int:
        """Per-body ground-stream slot count in banded mode — MUST mirror
        update_parallel's gc construction (generic ground/heightfield stream
        + polytope convex-ground grids + one V-slot stream per SDF collider)
        so the warm-start carry in PhysicsState is sized for the traced
        step."""
        g = 0
        if st.heightfield_terrain >= 0 or self.system.ground_plane:
            g += self.ground_slots_per_body
        v = st.poly_verts.shape[1] \
            if (st.has_convex or st.sdf_colliders) else 0
        if st.has_convex and self.system.ground_plane:
            g += v
        g += len(st.sdf_colliders) * v
        return g

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
        nb = st.nb  # store capacity + instanced static slots
        # initial body poses from entity world transforms
        pos = np.zeros((3, nb), np.float32)
        rot = np.tile(np.array([[0.0], [0.0], [0.0], [1.0]], np.float32), (1, nb))
        for slot in range(self.actors.capacity):
            e = int(self.actors.entity[slot])
            if e >= 0:
                p, r, _ = self.world.get_global_transform(e)
                pos[:, slot] = p
                rot[:, slot] = r
        if st.n_instanced:
            pos[:, -st.n_instanced:] = st.inst_pos
            rot[:, -st.n_instanced:] = st.inst_rot
        nc = self.controllers.capacity
        cpos = np.zeros((3, nc), np.float32)
        for slot in range(nc):
            e = int(self.controllers.entity[slot])
            if e >= 0:
                cpos[:, slot] = self.world.get_global_transform(e)[0]
        n_lam = 0 if st.sap else st.n_contact_slots
        banded = st.sap and self.broadphase in ("auto", "banded") \
            and self.warm_starting
        if banded:
            ns = self.sap_sweeps
            S = ns if ns in (1, 2) else (5 if ns >= 5 else 4)
            K, k = self.sap_neighbors, self.points_per_pair
            G = self._banded_ground_slots(st)
            sap_lam = jnp.zeros((S, 3, k, K, nb), jnp.float32)
            sap_glam = jnp.zeros((3, G, nb), jnp.float32)
            sap_rank = jnp.full((S, nb), -1, jnp.int32)
        else:
            sap_lam = jnp.zeros((0,), jnp.float32)
            sap_glam = jnp.zeros((0,), jnp.float32)
            sap_rank = jnp.zeros((0,), jnp.int32)
        return PhysicsState(
            pos=jnp.asarray(pos),
            rot=jnp.asarray(rot),
            vel=jnp.zeros((3, nb), jnp.float32),
            angvel=jnp.zeros((3, nb), jnp.float32),
            sleep=jnp.zeros(nb, jnp.int32),
            ctrl_pos=jnp.asarray(cpos),
            ctrl_vel_y=jnp.zeros(nc, jnp.float32),
            ctrl_disp=jnp.zeros((3, nc), jnp.float32),
            ctrl_grounded=jnp.zeros(nc, bool),
            lam_n=jnp.zeros(n_lam, jnp.float32),
            sap_lam=sap_lam, sap_glam=sap_glam, sap_rank=sap_rank,
            lam_t1=jnp.zeros(n_lam, jnp.float32),
            lam_t2=jnp.zeros(n_lam, jnp.float32),
            pair_key=(jnp.full(st.pair_budget, -1, jnp.int32)
                      if st.pruned else jnp.zeros(0, jnp.int32)),
            veh_throttle=jnp.zeros(self.vehicles.capacity, jnp.float32),
            veh_steer=jnp.zeros(self.vehicles.capacity, jnp.float32),
            counters={"active_contacts": jnp.int32(0),
                      "sap_window_miss": jnp.int32(0),
                      "pruned_pair_miss": jnp.int32(0)},
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
        if st.has_vehicles:
            vel, angvel = self._update_vehicles(st, ms, pos, rot, vel, angvel,
                                                dt_c)

        shape = jnp.asarray(st.shape)
        radius = jnp.asarray(st.radius)
        he = jnp.asarray(st.half_extents)
        # convex actors get exact polytope ground contacts (all-pairs path AND
        # the banded rank-space default — polytope_ground_grids streams);
        # mask them out of the generic sphere-fallback ground stream
        banded_bp = st.sap and self.broadphase in ("auto", "banded")
        has_conv_gnd = st.has_convex and sys.ground_plane \
            and ((not st.sap) or banded_bp)
        gc_dyn = dyn & ~jnp.asarray(st.shape == P.SHAPE_CONVEX) \
            if has_conv_gnd else dyn
        if st.heightfield_terrain >= 0:
            bank = self._terrain_bank()
            gc = P.heightfield_contacts(pos, rot, shape, radius, he, gc_dyn,
                                        bank, st.heightfield_terrain,
                                        st.heightfield_origin,
                                        slots_per_body=self.ground_slots_per_body,
                                        shape_np=st.shape)
        elif sys.ground_plane:
            gc = P.ground_contacts(pos, rot, shape, radius, he, gc_dyn,
                                   ground_y=sys.ground_y,
                                   slots_per_body=self.ground_slots_per_body)
        else:
            gc = None
        # SDF mesh-collider streams (work under every broadphase): candidate
        # points are the dynamic bodies' polytope vertices. The banded
        # rank-space path needs BODY-MAJOR [V, NB] grids over all slots, the
        # static-slot paths use the compact dynamic subset.
        sdf_streams = []
        if st.sdf_colliders:
            from lumixengine_tpu.ops import convex_ops as CV
            body_sel = (np.arange(pos.shape[-1], dtype=np.int32)
                        if st.sap else st.dyn_idx)
            didx = jnp.asarray(body_sel)
            pv = st.poly_verts[:, :, body_sel]            # np [3,V,Nd]
            vmask = (st.poly_vert_valid[:, body_sel]
                     & st.dyn_mask[None, body_sel])       # np [V,Nd]
            nd = len(body_sel)
            v_slots = pv.shape[1]
            pd = jnp.take(pos, didx, axis=-1)
            qd = jnp.take(rot, didx, axis=-1)
            vw = CV.polytope_world_verts(pd, qd, pv)      # [..,3,V,Nd]
            pts = vw.reshape(vw.shape[:-2] + (v_slots * nd,))
            eff_r = np.tile(st.poly_rad[body_sel], v_slots)
            body_idx = np.tile(body_sel, v_slots)
            valid = jnp.asarray(vmask.reshape(-1))
            for grid, origin, cell, mpos, mrot in st.sdf_colliders:
                sc = CV.sdf_contacts(pts, jnp.asarray(eff_r), body_idx,
                                     grid, origin, cell,
                                     jnp.asarray(mpos), jnp.asarray(mrot))
                sdf_streams.append(sc._replace(active=sc.active & valid))
        miss = jnp.int32(0)
        proj = None  # position-projection closure, applied after integration
        if st.sap:
            # banded rank-space solve is the default at this scale (50x the
            # segment_sum path); all per-body streams (ground/heightfield/
            # SDF/convex-ground) are body-major [G, NB] grids it re-ranks
            # wholesale
            if has_conv_gnd and st.sap:
                from lumixengine_tpu.ops import convex_ops as CV
                sel = jnp.asarray(st.dyn_mask
                                  & (st.shape == P.SHAPE_CONVEX))
                cg = CV.polytope_ground_grids(pos, rot, st.poly_verts,
                                              st.poly_rad, sel, sys.ground_y)
                gc = cg if gc is None else P.concat_contacts(gc, cg)
            for sc in sdf_streams:
                gc = sc if gc is None else P.concat_contacts(gc, sc)
            if self.broadphase in ("auto", "banded"):
                (vel, angvel, n_active, miss, proj,
                 warm_carry) = self._banded_solve(
                    st, pos, rot, vel, angvel, shape, radius, he, dyn, gc,
                    dt_c, ms)
                if warm_carry is not None:
                    ms = ms.replace(sap_lam=warm_carry[0],
                                    sap_glam=warm_carry[1],
                                    sap_rank=warm_carry[2])
            else:
                vel, angvel, n_active, miss, proj = self._sap_solve(
                    st, pos, rot, vel, angvel, shape, radius, he, dyn, gc,
                    dt_c)
        else:
            # stream order MUST match PhysStatics' slot structure:
            # [ground | simple pairs | convex pairs | convex ground | sdf];
            # pruned mode appends the compacted pair stream LAST with
            # device-built incidence columns
            streams = [] if gc is None else [gc]
            if len(st.pair_a) and not st.pruned:
                streams.append(P.pair_contacts(
                    pos, rot, st.shape, radius, he, st.pair_a, st.pair_b,
                    points_per_pair=self.points_per_pair))
            if len(st.conv_pair_a):
                from lumixengine_tpu.ops import convex_ops as CV
                streams.append(CV.polytope_pair_contacts(
                    pos, rot, st.poly_verts, st.poly_axes, st.poly_rad,
                    st.conv_pair_a, st.conv_pair_b,
                    points_per_pair=self.points_per_pair))
            if has_conv_gnd and len(st.conv_idx):
                from lumixengine_tpu.ops import convex_ops as CV
                streams.append(CV.polytope_ground_contacts(
                    pos, rot, st.poly_verts[:, :, st.conv_idx],
                    st.poly_rad[st.conv_idx], st.conv_idx, sys.ground_y,
                    points_per_body=self.ground_slots_per_body))
            streams.extend(sdf_streams)
            contacts = None
            for s in streams:
                contacts = s if contacts is None else P.concat_contacts(contacts, s)

            inc_a_use = st.incidence_a
            inc_b_use = st.incidence_b
            fric_use = st.friction
            rest_use = st.restitution
            if st.pruned:
                cc, onehot_a, onehot_b, cfric, crest, miss, pair_key = \
                    self._compacted_pair_stream(st, pos, rot, shape, radius, he)
                k = self.points_per_pair
                if contacts is not None:
                    contacts = P.Contacts(
                        body_a=contacts.body_a, body_b=contacts.body_b,
                        point=jnp.concatenate([contacts.point, cc.point], axis=-1),
                        normal=jnp.concatenate([contacts.normal, cc.normal], axis=-1),
                        depth=jnp.concatenate([contacts.depth, cc.depth], axis=-1),
                        active=jnp.concatenate([contacts.active, cc.active], axis=-1))
                else:
                    contacts = cc
                inc_a_use = jnp.concatenate(
                    [jnp.asarray(st.incidence_a, jnp.bfloat16), onehot_a],
                    axis=-1)
                inc_b_use = jnp.concatenate(
                    [jnp.asarray(st.incidence_b, jnp.bfloat16), onehot_b],
                    axis=-1)
                fric_use = jnp.concatenate([jnp.asarray(st.friction), cfric])
                rest_use = jnp.concatenate([jnp.asarray(st.restitution), crest])

            if contacts is not None:
                iiw = P.inv_inertia_world_diag(rot, jnp.asarray(st.inv_inertia_body))
                # solver dispatch (like ops/culling.frustum_cull): the fused
                # Pallas loop on TPU — iterations stay VMEM-resident instead
                # of 12x round-tripping [.., C] intermediates through HBM —
                # jnp elsewhere (tests run the oracle)
                use_pallas = self.solver_backend == "pallas" or (
                    self.solver_backend == "auto"
                    and jax.default_backend() == "tpu")
                solve = P.solve_contacts
                if use_pallas:
                    from lumixengine_tpu.ops.solver_pallas import solve_contacts_fused
                    solve = solve_contacts_fused
                warm = (ms.lam_n, ms.lam_t1, ms.lam_t2)
                if st.pruned:
                    # compacted-slot identity gate: top-k compaction renumbers
                    # suffix slots on churn frames — carrying another pair's
                    # impulse into the new occupant pops, so zero those
                    prefix = st.n_contact_slots - k * st.pair_budget
                    same = jnp.tile(pair_key == ms.pair_key, k)
                    keep = jnp.concatenate(
                        [jnp.ones(same.shape[:-1] + (prefix,), bool), same],
                        axis=-1)
                    warm = tuple(jnp.where(keep, w, 0.0) for w in warm)
                    ms = ms.replace(pair_key=pair_key)
                kwargs = dict(
                    iterations=self.solver_iterations,
                    # position projection owns depth correction — a velocity
                    # bias on top makes resting stacks bounce (split impulse)
                    baumgarte=0.0 if self.position_iterations > 0 else 0.2,
                    warm_lambdas=warm,
                    return_lambdas=True,
                )
                if use_pallas and self.position_iterations > 0:
                    # projection runs INSIDE the fused kernel: dpos depends
                    # only on the contact set, so adding it after
                    # integrate_positions is exact (≙ project_positions) and
                    # the 3-iteration jnp loop's ~75 launches disappear
                    vel, angvel, lams, dpos = solve(
                        pos, rot, vel, angvel, contacts,
                        st.inv_mass, iiw, inc_a_use, inc_b_use, dt_c,
                        fric_use, rest_use,
                        position_iterations=self.position_iterations,
                        return_dpos=True, **kwargs)
                    proj = lambda p: p + dpos  # noqa: E731
                else:
                    vel, angvel, lams = solve(
                        pos, rot, vel, angvel, contacts,
                        st.inv_mass, iiw, inc_a_use, inc_b_use, dt_c,
                        fric_use, rest_use, **kwargs)
                    cts = contacts
                    proj = lambda p: P.project_positions(  # noqa: E731
                        p, cts, st.inv_mass, inc_a_use, inc_b_use,
                        iterations=self.position_iterations)
                ms = ms.replace(lam_n=lams[0], lam_t1=lams[1], lam_t2=lams[2])
                n_active = jnp.sum(contacts.active).astype(jnp.int32)
            else:
                n_active = jnp.int32(0)
            if st.pruned:
                ms = ms.replace(counters={**ms.counters,
                                          "pruned_pair_miss": miss})

        # joints (≙ PxDistanceJoint / PxSphericalJoint / PxRevoluteJoint / PxD6Joint)
        if len(st.joint_a):
            vel, angvel = self._solve_joints(pos, rot, vel, angvel, st, dt_c)

        if st.has_ccd:
            pre_pos = pos
        pos, rot = P.integrate_positions(pos, rot, vel, angvel, dt_c, dyn)
        if st.has_ccd:
            pos = self._ccd_clamp(st, pre_pos, pos)
        if proj is not None and self.position_iterations > 0:
            pos = proj(pos)
        vel, angvel, sleep, _ = P.update_sleep(vel, angvel, ms.sleep, dyn)

        ms = ms.replace(pos=pos, rot=rot, vel=vel, angvel=angvel, sleep=sleep,
                        counters={**ms.counters, "active_contacts": n_active,
                                  "sap_window_miss": miss})
        return state.replace(modules={**state.modules, self.name: ms})

    def _ccd_clamp(self, st: PhysStatics, pre_pos, new_pos):
        """Continuous collision for CCD-flagged bodies (≙ PhysX
        eENABLE_CCD): sample K points along this step's motion and stop at
        the last sample before first penetration — the discrete solver
        resolves the contact next frame from a non-tunneled pose. Covers
        the static environment (ground plane + SDF mesh colliders) AND
        dynamic-vs-dynamic pairs: every CCD body sweeps its conservative
        thickness (ccd_r) against all other bodies' simultaneously sampled
        paths, so two fast bodies meeting head-on clamp before crossing
        (≙ PhysX CCD between dynamic pairs) instead of tunneling."""
        K = 4
        sys = self.system
        ts = (jnp.arange(1, K + 1, dtype=jnp.float32) / K)[:, None]    # [K,1]
        delta = new_pos - pre_pos
        path = pre_pos[..., :, None, :] + delta[..., :, None, :] * ts  # [..,3,K,NB]
        r_eff = jnp.asarray(st.ccd_r)
        dist = jnp.full(path.shape[:-3] + path.shape[-2:], 1e9)        # [..,K,NB]
        if sys.ground_plane:
            dist = jnp.minimum(dist, path[..., 1, :, :] - sys.ground_y - r_eff)
        if st.sdf_colliders:
            from lumixengine_tpu.ops import convex_ops as CV
            nb = new_pos.shape[-1]
            flat = path.reshape(path.shape[:-2] + (K * nb,))
            for grid, origin, cell, mpos, mrot in st.sdf_colliders:
                inv = jnp.asarray(
                    np.concatenate([-mrot[:3], mrot[3:4]]))[..., :, None]
                from lumixengine_tpu.core import math as lm
                local = lm.quat_rotate(inv, flat - jnp.asarray(mpos)[..., :, None],
                                       axis=-2)
                d = CV.sdf_sample(grid, origin, cell, local)
                dist = jnp.minimum(
                    dist, d.reshape(d.shape[:-1] + (K, nb)) - r_eff)
        # dynamic-dynamic (and vs static actors): CCD columns against every
        # occupied body's sampled path — both endpoints move within the same
        # step, so the RELATIVE trajectory is what gets sampled
        ci = np.nonzero(st.ccd_mask)[0].astype(np.int32)
        if ci.size:
            ci_j = jnp.asarray(ci)
            path_i = jnp.take(path, ci_j, axis=-1)                 # [..,3,K,C]
            d_ij = path_i[..., :, :, :, None] - path[..., :, :, None, :]
            dist_ij = jnp.sqrt(jnp.maximum(
                jnp.sum(d_ij * d_ij, axis=-4), 1e-12))             # [..,K,C,NB]
            rad_ij = r_eff[ci][:, None] + r_eff[None, :]           # [C,NB]
            ok_j = jnp.asarray(st.occupied)[None, :] \
                & (jnp.asarray(ci)[:, None] != jnp.arange(
                    r_eff.shape[0], dtype=jnp.int32)[None, :])     # [C,NB]
            pair_d = jnp.where(ok_j, dist_ij - rad_ij, 1e9)
            dist = dist.at[..., ci_j].min(jnp.min(pair_d, axis=-1))
        hit = dist < 0.0                                               # [..,K,NB]
        any_hit = jnp.any(hit, axis=-2)
        first = jnp.argmax(hit, axis=-2)                               # [..,NB]
        # sweep only FAST movers (step motion beyond half the body
        # thickness, ≙ PhysX's CCD motion threshold): resting CCD bodies sit
        # in permanent sub-slop contact and must not freeze at t=0
        fast = jnp.sum(delta * delta, axis=-2) > (0.5 * r_eff) ** 2
        # stop at the sample BEFORE the first penetrating one
        t_safe = jnp.where(any_hit & fast & jnp.asarray(st.ccd_mask),
                           first.astype(jnp.float32) / K, 1.0)
        return pre_pos + delta * t_safe[..., None, :]

    def _compacted_pair_stream(self, st: PhysStatics, pos, rot, shape,
                               radius, he):
        """Pruned broadphase: test the static candidate pairs for AABB
        overlap, compact the overlapping ones into the fixed `pair_budget`
        (stable order — warm-start slot identity survives while the active
        set is stable), and run the narrowphase on just those. Returns
        (Contacts, one-hot incidence columns a/b [NB, k*B], per-slot friction,
        restitution, overflow count)."""
        k = self.points_per_pair
        B = st.pair_budget
        nb = pos.shape[-1]
        pa_np, pb_np = st.pair_a, st.pair_b
        mn, mx = P.world_aabb(pos, rot, shape, radius, he)
        m = self.pruned_margin
        amn = jnp.take(mn, jnp.asarray(pa_np), axis=-1)
        amx = jnp.take(mx, jnp.asarray(pa_np), axis=-1)
        bmn = jnp.take(mn, jnp.asarray(pb_np), axis=-1)
        bmx = jnp.take(mx, jnp.asarray(pb_np), axis=-1)
        overlap = jnp.all((amn <= bmx + m) & (bmn <= amx + m), axis=-2)  # [P]
        # stable compaction shared with the big-world pipeline
        from lumixengine_tpu.ops.physics_big import compact_pairs
        cpa, cpb, valid, miss = compact_pairs(
            jnp.asarray(pa_np), jnp.asarray(pb_np), overlap, B)
        # per-slot pair identity for cross-frame warm-start matching: top-k
        # compaction renumbers slots when the overlap set churns, so warm
        # lambdas are only valid for slots whose key is unchanged
        pair_key = jnp.where(valid, cpa * nb + cpb, -1).astype(jnp.int32)

        cc = P.pair_contacts(pos, rot, shape, radius, he, cpa, cpb,
                             points_per_pair=k)
        cc = cc._replace(active=cc.active & jnp.tile(valid, k))
        # device-built incidence columns + per-slot materials
        bodies_a = jnp.tile(cpa, k)
        bodies_b = jnp.tile(cpb, k)
        # bf16 incidence: entries are 0/1 (exact in bf16) and the matrices are
        # the largest per-world buffers at big world counts (f32 pair = 3.5G
        # at 4096 worlds — the HBM tipping point)
        rows = jnp.arange(nb, dtype=jnp.int32)[:, None]
        onehot_a = (rows == bodies_a[None, :]).astype(jnp.bfloat16)
        onehot_b = (rows == bodies_b[None, :]).astype(jnp.bfloat16)
        fricb = jnp.asarray(st.friction_body)
        restb = jnp.asarray(st.restitution_body)
        cfric = jnp.sqrt(jnp.maximum(fricb[bodies_a] * fricb[bodies_b], 0.0))
        crest = jnp.maximum(restb[bodies_a], restb[bodies_b])
        return cc, onehot_a, onehot_b, cfric, crest, miss, pair_key

    def _banded_convex_merge(self, st: PhysStatics, rank, sp, sr, K, k,
                             p_point, p_normal, p_depth, p_raw):
        """Substitute EXACT polytope SAT contacts (the same narrowphase the
        static-pair convex path runs — ops/convex_ops.py) into the banded
        grids for every pair involving a convex hull; simple pairs keep the
        cheaper analytic narrowphase. This is what keeps banded mode — the
        default at scale — PhysX-exact on convex content (≙ PhysX PCM,
        reference physics_module.cpp:1870-1877). `rank` maps body-order
        arrays into this sweep's rank space."""
        from lumixengine_tpu.ops import physics_banded as PBD
        s_pv = rank(jnp.asarray(st.poly_verts))
        s_pax = rank(jnp.asarray(st.poly_axes))
        s_prad = rank(jnp.asarray(st.poly_rad))
        c_pt, c_n, c_d, c_act = PBD.banded_polytope_grids(
            sp, sr, s_pv, s_pax, s_prad, K, k)
        is_cvx = rank(jnp.asarray(st.shape == P.SHAPE_CONVEX))
        cvx_pair = is_cvx[None, :] | PBD.banded_pair_data(is_cvx, K)  # [K,NB]
        return (jnp.where(cvx_pair, c_pt, p_point),
                jnp.where(cvx_pair, c_n, p_normal),
                jnp.where(cvx_pair, c_d, p_depth),
                jnp.where(cvx_pair, c_act, p_raw))

    def _banded_solve(self, st: PhysStatics, pos, rot, vel, angvel,
                      shape, radius, he, dyn, gc, dt_c, ms):
        """Large-world contact pipeline in sorted rank space (see
        ops/physics_banded.py): every SAP candidate pair connects rank i to
        rank i+d, so the solver runs gather-free on banded slot grids — the
        segment_sum path this replaces was 50x slower at 5k+ actors.
        Always the multi-sweep pipeline: sap_sweeps=4 (default) runs the
        guaranteed-coverage offset-column sweeps (dense piles keep every
        overlapping pair inside some sweep's window, with a per-step
        zero-miss certificate in the counters); sap_sweeps=1 degenerates to
        the classic min-x SAP order with its window-bound miss counter."""
        return self._banded_solve_multi(st, pos, rot, vel, angvel,
                                        shape, radius, he, dyn, gc, dt_c, ms)

    def _banded_solve_multi(self, st: PhysStatics, pos, rot, vel, angvel,
                            shape, radius, he, dyn, gc, dt_c, ms):
        """Multi-sweep banded pipeline: one banded grid per sweep order
        (sweep_orders — offset cell columns guarantee every overlapping pair
        lands in some sweep's window), solved jointly by
        solve_contacts_banded_multi with velocities in body order. The miss
        counter is the per-step zero-miss certificate (column_window_miss):
        zero ⇒ no contact was dropped this step, at any density.

        Warm starting (≙ PhysX persistent contacts): last frame's
        accumulated lambdas (ms.sap_lam per sweep, ms.sap_glam for ground
        streams) are re-matched to this frame's slots through the previous
        rank maps (ms.sap_rank → match_warm_lams) and seed the solver;
        returns the new carry alongside the solve so update_parallel can
        store it. Returns (vel, angvel, n_active, miss, proj, warm_carry)."""
        from lumixengine_tpu.ops import physics_banded as PBD

        K = self.sap_neighbors
        k = self.points_per_pair
        nb = pos.shape[-1]
        occ = jnp.asarray(st.occupied)
        mn, mx = P.world_aabb(pos, rot, shape, radius, he)
        far = jnp.where(occ, 0.0, 1e9)   # dead slots park far +x, never pair
        mn = mn + far[None, :]
        mx = mx + far[None, :]
        orders, ranks, col_keys = PBD.sweep_orders(mn, mx, occ,
                                                   self.sap_sweeps)
        lmx = jnp.asarray(self.system.layer_matrix)
        fric_body = jnp.asarray(st.friction_body)
        rest_body = jnp.asarray(st.restitution_body)
        layer = jnp.asarray(st.layer)
        im_body = jnp.asarray(st.inv_mass)

        warm_ok = ms.sap_rank.size > 0
        warm_in = []
        sweeps = []
        miss = jnp.int32(0)
        n_active = jnp.int32(0)
        for s, (order, ck) in enumerate(zip(orders, col_keys)):
            def rk(x, _o=order):
                return jnp.take(x, _o, axis=-1)

            sp, sr = rk(pos), rk(rot)
            s_shape, s_rad, s_he = rk(shape), rk(radius), rk(he)
            s_dyn, s_occ = rk(dyn), rk(occ)
            s_fric, s_rest = rk(fric_body), rk(rest_body)
            s_layer = rk(layer)
            s_mn, s_mx = rk(mn), rk(mx)
            p_point, p_normal, p_depth, p_raw, ok = PBD.banded_pair_grids(
                sp, sr, s_rad, s_he, s_shape, s_mn, s_mx, K, k, any_caps=True)
            if st.has_convex:
                p_point, p_normal, p_depth, p_raw = \
                    self._banded_convex_merge(st, rk, sp, sr, K, k,
                                              p_point, p_normal, p_depth,
                                              p_raw)
            layer_b = PBD.banded_pair_data(s_layer, K)
            layer_ok = lmx.reshape(-1)[s_layer[None, :] * MAX_LAYERS + layer_b]
            dyn_b = PBD.banded_pair_data(s_dyn, K)
            occ_b = PBD.banded_pair_data(s_occ, K)
            ok = (ok & layer_ok & (s_dyn[None, :] | dyn_b)
                  & s_occ[None, :] & occ_b)
            if s > 0:
                cov = PBD.cross_sweep_coverage(order, ranks[:s], K)
                ok = ok & ~cov
            fric_b = PBD.banded_pair_data(s_fric, K)
            rest_b = PBD.banded_pair_data(s_rest, K)
            sw = {"order": order, "p_point": p_point, "p_normal": p_normal,
                  "p_depth": p_depth, "p_active": p_raw & ok[None, :, :],
                  "p_fric": jnp.broadcast_to(jnp.sqrt(jnp.maximum(
                      s_fric[None, :] * fric_b, 0.0))[None], p_depth.shape),
                  "p_rest": jnp.broadcast_to(jnp.maximum(
                      s_rest[None, :], rest_b)[None], p_depth.shape)}
            if warm_ok:
                wl = PBD.match_warm_lams(ms.sap_lam[s], ms.sap_rank[s],
                                         order, K)
                warm_in.append({"p": (wl[0], wl[1], wl[2])})
            if s == 0 and gc is not None:
                gsl = gc.depth.shape[-1] // nb
                sw["g_point"] = rk(
                    gc.point.reshape(gc.point.shape[:-1] + (gsl, nb)))
                sw["g_normal"] = rk(gc.normal.reshape(sw["g_point"].shape))
                sw["g_depth"] = rk(
                    gc.depth.reshape(gc.depth.shape[:-1] + (gsl, nb)))
                sw["g_active"] = rk(gc.active.reshape(sw["g_depth"].shape)) \
                    & s_occ[None, :]
                sw["g_fric"] = jnp.broadcast_to(jnp.sqrt(jnp.maximum(
                    s_fric * self.system.ground_friction, 0.0))[None, :],
                    sw["g_depth"].shape)
                sw["g_rest"] = jnp.broadcast_to(
                    jnp.maximum(s_rest,
                                self.system.ground_restitution)[None, :],
                    sw["g_depth"].shape)
                n_active = n_active + jnp.sum(sw["g_active"]).astype(jnp.int32)
                if warm_ok:
                    warm_in[0]["g"] = tuple(rk(ms.sap_glam[c])
                                            for c in range(3))
            if ck is not None:
                miss = miss + PBD.column_window_miss(s_mn, s_mx, rk(ck), K,
                                                     occ=s_occ)
            elif len(orders) == 1:
                # classic single sweep: its x-window bound IS the certificate
                miss = miss + PBD.window_miss(s_mn, s_mx, K, occ=s_occ)
            n_active = n_active + jnp.sum(sw["p_active"]).astype(jnp.int32)
            sweeps.append(sw)

        iiw_body = P.inv_inertia_world_diag(rot,
                                            jnp.asarray(st.inv_inertia_body))
        vel, angvel, lams = PBD.solve_contacts_banded_multi(
            vel, angvel, im_body, iiw_body, pos, sweeps, dt_c,
            iterations=self.solver_iterations,
            baumgarte=0.0 if self.position_iterations > 0 else 0.2,
            warm=warm_in if warm_ok else None, return_lams=True)

        def proj(p):
            return PBD.project_positions_banded_multi(
                p, sweeps, im_body, iterations=self.position_iterations)

        warm_carry = None
        if warm_ok:
            new_lam = jnp.stack(
                [jnp.stack(l[3:6], axis=0) for l in lams], axis=0)
            assert new_lam.shape == ms.sap_lam.shape, \
                (new_lam.shape, ms.sap_lam.shape)
            if gc is not None:
                glam_rank = jnp.stack(lams[0][0:3], axis=0)  # sweep-0 rank
                new_glam = jnp.zeros_like(glam_rank).at[
                    ..., orders[0]].set(glam_rank)
                assert new_glam.shape == ms.sap_glam.shape, \
                    (new_glam.shape, ms.sap_glam.shape)
            else:
                new_glam = ms.sap_glam
            warm_carry = (new_lam, new_glam,
                          jnp.stack(ranks, axis=0).astype(jnp.int32))

        return vel, angvel, n_active, miss, proj, warm_carry

    def _sap_solve(self, st: PhysStatics, pos, rot, vel, angvel,
                   shape, radius, he, dyn, gc, dt_c):
        """Dynamic-pair contact pipeline (≙ PhysX SAP broadphase): sort-window
        candidate pairs + segment-sum PGS — scales to 10k+ actors where the
        static all-pairs incidence path cannot (see ops/physics_big.py)."""
        from lumixengine_tpu.ops import physics_big as PB

        k = self.points_per_pair
        occ = jnp.asarray(st.occupied)
        mn, mx = P.world_aabb(pos, rot, shape, radius, he)
        far = jnp.where(occ, 0.0, 1e9)  # unoccupied slots can never overlap
        mn = mn + far[None, :]
        mx = mx + far[None, :]
        pa, pb, ok, miss = PB.sap_pairs(pos, mn, mx, self.sap_neighbors,
                                        return_miss_count=True)
        layer = jnp.asarray(st.layer)
        lmx = jnp.asarray(self.system.layer_matrix)
        ok &= lmx[layer[pa], layer[pb]]
        ok &= dyn[pa] | dyn[pb]
        c = P.pair_contacts(pos, rot, shape, radius, he, pa, pb,
                            points_per_pair=k)
        fricb = jnp.asarray(st.friction_body)
        restb = jnp.asarray(st.restitution_body)
        cba = jnp.asarray(c.body_a)
        cbb = jnp.asarray(c.body_b)
        pair_active = c.active & jnp.tile(ok, k)
        pair_fric = jnp.sqrt(jnp.maximum(fricb[cba] * fricb[cbb], 0.0))
        pair_rest = jnp.maximum(restb[cba], restb[cbb])
        if gc is not None:
            gba = jnp.asarray(gc.body_a)
            gnd_fric = jnp.sqrt(jnp.maximum(
                fricb[gba] * self.system.ground_friction, 0.0))
            gnd_rest = jnp.maximum(restb[gba], self.system.ground_restitution)
            point = jnp.concatenate([gc.point, c.point], axis=-1)
            normal = jnp.concatenate([gc.normal, c.normal], axis=-1)
            depth = jnp.concatenate([gc.depth, c.depth], axis=-1)
            active = jnp.concatenate([gc.active & occ[gba], pair_active], axis=-1)
            body_a = jnp.concatenate([gba, cba])
            body_b = jnp.concatenate([jnp.zeros_like(gba), cbb])
            has_b = jnp.concatenate([jnp.zeros(gba.shape[-1], jnp.float32),
                                     jnp.ones(cba.shape[-1], jnp.float32)])
            cfric = jnp.concatenate([gnd_fric, pair_fric])
            crest = jnp.concatenate([gnd_rest, pair_rest])
        else:
            point, normal, depth, active = c.point, c.normal, c.depth, pair_active
            body_a, body_b = cba, cbb
            has_b = jnp.ones(cba.shape[-1], jnp.float32)
            cfric, crest = pair_fric, pair_rest
        iiw = P.inv_inertia_world_diag(rot, jnp.asarray(st.inv_inertia_body))
        im = jnp.asarray(st.inv_mass)
        vel, angvel = PB.solve_contacts_dynamic(
            pos, vel, angvel, im, iiw,
            point, normal, depth, active, body_a, body_b, has_b,
            cfric, crest, dt_c, iterations=self.solver_iterations,
            baumgarte=0.0 if self.position_iterations > 0 else 0.2,
        )
        proj = lambda p: PB.project_positions_dynamic(  # noqa: E731
            p, normal, depth, active, body_a, body_b, has_b, im,
            iterations=self.position_iterations)
        return vel, angvel, jnp.sum(active).astype(jnp.int32), miss, proj

    def _solve_joints(self, pos, rot, vel, angvel, st: PhysStatics, dt):
        """Velocity-level joint constraints with positional Baumgarte bias.

        distance: scalar along the anchor line (≙ PxDistanceJoint)
        spherical/d6: anchors coincide — 3-axis point constraint with angular
        response via r x imp (≙ PxSphericalJoint; d6 uses its locked-linear part)
        hinge: spherical + angular velocity projected onto the hinge axis
        (≙ PxRevoluteJoint without drives/limits yet)
        """
        ja = jnp.asarray(st.joint_a)
        jb = jnp.asarray(st.joint_b)
        jt = st.joint_type  # static np
        im_a = jnp.asarray(st.inv_mass)[ja]
        im_b = jnp.asarray(st.inv_mass)[jb]
        nbod = pos.shape[-1]
        nj = len(st.joint_a)
        inc_a = np.zeros((nbod, nj), np.float32)
        inc_a[st.joint_a, np.arange(nj)] = 1.0
        inc_b = np.zeros((nbod, nj), np.float32)
        inc_b[st.joint_b, np.arange(nj)] = 1.0
        inc_a = jnp.asarray(inc_a)
        inc_b = jnp.asarray(inc_b)
        inv_mass = jnp.asarray(st.inv_mass)
        iiw = P.inv_inertia_world_diag(rot, jnp.asarray(st.inv_inertia_body))
        II_a = jnp.take(iiw, ja, axis=-1)
        II_b = jnp.take(iiw, jb, axis=-1)

        from lumixengine_tpu.core import math as lm

        rot_a = jnp.take(rot, ja, axis=-1)
        rot_b = jnp.take(rot, jb, axis=-1)
        r_a = lm.quat_rotate(rot_a, jnp.asarray(st.joint_anchor_a), axis=-2)
        r_b = lm.quat_rotate(rot_b, jnp.asarray(st.joint_anchor_b), axis=-2)
        pa = jnp.take(pos, ja, axis=-1) + r_a
        pb = jnp.take(pos, jb, axis=-1) + r_b

        err_vec = pb - pa
        is_dist = jnp.asarray(jt == 0)

        # proper per-axis effective masses k_i = 1/m_a + 1/m_b +
        # e_i·((I⁻¹(r×e_i))×r) for both bodies (same formula as contacts)
        def ang_term(r, d, II):
            rxd = lm.cross(r, d, axis=-2)
            return jnp.sum(lm.cross(II * rxd, r, axis=-2) * d, axis=-2)

        basis = [jnp.zeros_like(err_vec).at[..., i, :].set(1.0) for i in range(3)]
        k_axes = jnp.stack([
            im_a + im_b + ang_term(r_a, e, II_a) + ang_term(r_b, e, II_b)
            for e in basis
        ], axis=-2)  # [..,3,NJ]

        # distance direction/error (fixed over the mini-iterations)
        dvec = err_vec
        dist = jnp.sqrt(jnp.maximum(jnp.sum(dvec * dvec, axis=-2), 1e-12))
        n = dvec / dist[..., None, :]
        # distance error: exact `length` by default; a [min,max] band when
        # max_distance > 0 (≙ PxDistanceJoint min/maxDistance flags)
        has_band = jnp.asarray((st.joint_max_dist > 0).astype(np.float32))
        err_exact = dist - jnp.asarray(st.joint_len)
        err_band = (jnp.maximum(dist - jnp.asarray(st.joint_max_dist), 0.0)
                    - jnp.maximum(jnp.asarray(st.joint_min_dist) - dist, 0.0))
        err_d = has_band * err_band + (1.0 - has_band) * err_exact
        k_n = im_a + im_b + ang_term(r_a, n, II_a) + ang_term(r_b, n, II_b)

        beta = 0.1
        relax = 0.6
        for _ in range(4):  # mini Gauss-Seidel over the joint set
            va = jnp.take(vel, ja, axis=-1) + lm.cross(jnp.take(angvel, ja, axis=-1), r_a, axis=-2)
            vb = jnp.take(vel, jb, axis=-1) + lm.cross(jnp.take(angvel, jb, axis=-1), r_b, axis=-2)
            vrel = vb - va
            vn = jnp.sum(vrel * n, axis=-2)
            # band joints only constrain when outside [min,max]
            act_d = has_band * (jnp.abs(err_d) > 0).astype(jnp.float32) \
                + (1.0 - has_band)
            lam_d = -(vn + beta * err_d / dt) / jnp.maximum(k_n, 1e-9) * relax * act_d
            imp_dist = n * lam_d[..., None, :]
            imp_point = -(vrel + beta * err_vec / dt) / jnp.maximum(k_axes, 1e-9) * relax
            if st.has_d6_config:
                # d6 per-axis linear motion (≙ PxD6Joint setMotion): solve the
                # point constraint per frame-A axis and zero the free axes
                frame_axes = [lm.quat_rotate(rot_a, jnp.asarray(b)[:, None],
                                             axis=-2) for b in np.eye(3, dtype=np.float32)]
                lmask = jnp.asarray(st.joint_lin_mask)
                imp_d6 = jnp.zeros_like(imp_point)
                for i, e in enumerate(frame_axes):
                    k_e = jnp.maximum(im_a + im_b + ang_term(r_a, e, II_a)
                                      + ang_term(r_b, e, II_b), 1e-9)
                    verr = jnp.sum(vrel * e, axis=-2)
                    perr = jnp.sum(err_vec * e, axis=-2)
                    lam_e = -(verr + beta * perr / dt) / k_e * relax
                    imp_d6 = imp_d6 + e * (lam_e * lmask[i])[..., None, :]
                is_d6j = jnp.asarray((jt == 3).astype(np.float32))[..., None, :]
                imp_point = imp_point * (1.0 - is_d6j) + imp_d6 * is_d6j
            imp = jnp.where(jnp.expand_dims(is_dist, -2), imp_dist, imp_point)
            dva = -jnp.einsum("nc,...kc->...kn", inc_a, imp)
            dvb = jnp.einsum("nc,...kc->...kn", inc_b, imp)
            vel = vel + (dva + dvb) * inv_mass[None, :]
            ta = -jnp.einsum("nc,...kc->...kn", inc_a, lm.cross(r_a, imp, axis=-2))
            tb = jnp.einsum("nc,...kc->...kn", inc_b, lm.cross(r_b, imp, axis=-2))
            angvel = angvel + (ta + tb) * iiw

        # hinge: remove relative angular velocity off-axis, then apply drive
        # and angular limits about the axis (≙ PxRevoluteJoint drive +
        # AngularLimitPair)
        hinge = np.nonzero(jt == 2)[0]
        if hinge.size:
            hj = jnp.asarray(hinge.astype(np.int32))
            rot_ah = jnp.take(rot_a, hj, axis=-1)
            rot_bh = jnp.take(rot_b, hj, axis=-1)
            axis_l = jnp.asarray(st.joint_axis[:, hinge])
            axis_w = lm.quat_rotate(rot_ah, axis_l, axis=-2)
            wa = jnp.take(angvel, ja[hj], axis=-1)
            wb = jnp.take(angvel, jb[hj], axis=-1)
            wrel = wb - wa
            off_axis = wrel - axis_w * jnp.sum(wrel * axis_w, axis=-2)[..., None, :]
            imw_a = jnp.take(iiw, ja[hj], axis=-1)
            imw_b = jnp.take(iiw, jb[hj], axis=-1)
            tau = -off_axis / jnp.maximum(imw_a + imw_b, 1e-9)

            # scalar angular effective mass about the axis
            k_ax = jnp.maximum(
                jnp.sum(axis_w * (imw_a + imw_b) * axis_w, axis=-2), 1e-9)
            w_ax = jnp.sum(wrel * axis_w, axis=-2)

            # drive toward target angular velocity, force-limited per step
            drive_on = jnp.asarray(st.joint_drive_on[hinge], jnp.float32)
            tgt = jnp.asarray(st.joint_drive_vel[hinge])
            fmax = jnp.asarray(st.joint_drive_force[hinge]) * dt
            lam_d = jnp.clip((tgt - w_ax) / k_ax, -fmax, fmax) * drive_on

            # limits: hinge angle from the rest-relative rotation's twist
            # about the axis; velocity bias pushes back into range
            rel = lm.quat_mul(lm.quat_conjugate(rot_ah, axis=-2), rot_bh, axis=-2)
            dtw = lm.quat_mul(lm.quat_conjugate(
                jnp.asarray(st.joint_rest_rel[:, hinge]), axis=-2), rel, axis=-2)
            twist_xyz = jnp.sum(dtw[..., 0:3, :] * axis_l, axis=-2)
            angle = 2.0 * jnp.arctan2(twist_xyz, dtw[..., 3, :])
            lim_on = jnp.asarray(st.joint_limit_on[hinge], jnp.float32)
            lo = jnp.asarray(st.joint_limit_min[hinge])
            hi = jnp.asarray(st.joint_limit_max[hinge])
            over = jnp.maximum(angle - hi, 0.0) - jnp.maximum(lo - angle, 0.0)
            lam_l = (-(0.2 / dt) * over - jnp.where(jnp.abs(over) > 0, w_ax, 0.0)) \
                / k_ax * lim_on

            imp_ax = axis_w * (lam_d + lam_l)[..., None, :]
            inc_ah = inc_a[:, hinge]
            inc_bh = inc_b[:, hinge]
            ta2 = -jnp.einsum("nc,...kc->...kn", inc_ah, tau + imp_ax)
            tb2 = jnp.einsum("nc,...kc->...kn", inc_bh, tau + imp_ax)
            angvel = angvel + (ta2 + tb2) * iiw

        # d6 locked angular axes (≙ PxD6Joint eLOCKED swing/twist): remove
        # relative angular velocity along the locked frame-A axes
        if st.has_d6_config and np.any(st.joint_ang_mask):
            d6 = np.nonzero(jt == 3)[0]
            if d6.size:
                dj = jnp.asarray(d6.astype(np.int32))
                rot_ad = jnp.take(rot_a, dj, axis=-1)
                wa = jnp.take(angvel, ja[d6], axis=-1)
                wb = jnp.take(angvel, jb[d6], axis=-1)
                wrel = wb - wa
                imw_a = jnp.take(iiw, ja[d6], axis=-1)
                imw_b = jnp.take(iiw, jb[d6], axis=-1)
                amask = jnp.asarray(st.joint_ang_mask[:, d6])
                locked = jnp.zeros_like(wrel)
                for i, b in enumerate(np.eye(3, dtype=np.float32)):
                    e = lm.quat_rotate(rot_ad, jnp.asarray(b)[:, None], axis=-2)
                    locked = locked + e * (jnp.sum(wrel * e, axis=-2)
                                           * amask[i])[..., None, :]
                tau6 = -locked / jnp.maximum(imw_a + imw_b, 1e-9)
                inc_ad = inc_a[:, d6]
                inc_bd = inc_b[:, d6]
                ta3 = -jnp.einsum("nc,...kc->...kn", inc_ad, tau6)
                tb3 = jnp.einsum("nc,...kc->...kn", inc_bd, tau6)
                angvel = angvel + (ta3 + tb3) * iiw
        return vel, angvel

    def set_vehicle_input(self, state: WorldState, entity: int,
                          throttle: float = 0.0, steer: float = 0.0) -> WorldState:
        """Driver inputs for a vehicle (≙ Vehicle accel/steer API)."""
        slot = self.vehicles.slot_of(entity)
        ms: PhysicsState = state.modules[self.name]
        ms = ms.replace(
            veh_throttle=ms.veh_throttle.at[..., slot].set(jnp.float32(throttle)),
            veh_steer=ms.veh_steer.at[..., slot].set(jnp.float32(steer)))
        return state.replace(modules={**state.modules, self.name: ms})

    def _update_vehicles(self, st: PhysStatics, ms: PhysicsState,
                         pos, rot, vel, angvel, dt):
        """Raycast-suspension vehicle forces (≙ physics_module.cpp
        updateVehicles → PxVehicle batch raycasts + update):

          suspension — ray from each wheel anchor along chassis-down; spring
                        k·compression − c·(contact-point up-velocity)
          drive       — throttle·peak_torque/wheel_radius along the (steered
                        for front slots) chassis forward, on grounded wheels
          lateral     — grip impulse cancelling sideways contact velocity

        All wheels batch as arrays; impulses scatter to chassis bodies via
        segment_sum."""
        nb = pos.shape[-1]
        wm = jnp.asarray(st.wheel_mask, jnp.float32)
        bidx = jnp.asarray(st.wheel_body)
        vidx = jnp.asarray(st.wheel_vehicle)
        q = jnp.take(rot, bidx, axis=-1)          # [..,4,NW]
        p = jnp.take(pos, bidx, axis=-1)
        anchor_w = lm.quat_rotate(q, jnp.asarray(st.wheel_anchor), axis=-2)
        r = anchor_w                               # lever arm from chassis COM
        wpos = p + anchor_w
        up = lm.quat_rotate(q, jnp.broadcast_to(
            jnp.asarray([0.0, 1.0, 0.0])[:, None], q[..., :3, :].shape), axis=-2)
        fwd = lm.quat_rotate(q, jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0])[:, None], q[..., :3, :].shape), axis=-2)

        # suspension ray vs the ground plane (heightfield support follows the
        # controller path's sample_height once vehicles need terrain)
        gy = jnp.float32(self.system.ground_y)
        # ray o + t·(−up): hits y=gy at t = (o_y − gy)/up_y
        t = (wpos[..., 1, :] - gy) / jnp.maximum(up[..., 1, :], 1e-3)
        radius = jnp.asarray(st.wheel_radius)
        rest = radius + jnp.asarray(st.wheel_droop)
        max_c = jnp.asarray(st.wheel_comp)
        compression = jnp.clip(rest - t, 0.0, jnp.asarray(st.wheel_droop) + max_c)
        # buried wheels (t < 0) are maximally compressed, not airborne
        grounded = (t <= rest).astype(jnp.float32) * wm

        cvel = jnp.take(vel, bidx, axis=-1) + lm.cross(
            jnp.take(angvel, bidx, axis=-1), r, axis=-2)
        v_up = jnp.sum(cvel * up, axis=-2)
        f_spring = jnp.maximum(
            jnp.asarray(st.wheel_spring) * compression
            - jnp.asarray(st.wheel_damper) * v_up, 0.0) * grounded

        # steered forward for front slots (0, 1)
        steer = jnp.take(ms.veh_steer, vidx) * (jnp.asarray(st.wheel_slot) < 2)
        cs, sn = jnp.cos(steer), jnp.sin(steer)
        side = lm.cross(up, fwd, axis=-2)
        dirv = fwd * cs[..., None, :] + side * sn[..., None, :]
        side_s = lm.cross(up, dirv, axis=-2)

        throttle = jnp.take(ms.veh_throttle, vidx)
        f_drive = throttle * jnp.take(jnp.asarray(st.veh_torque), vidx) / \
            jnp.maximum(radius, 1e-3) * grounded
        v_side = jnp.sum(cvel * side_s, axis=-2)
        # lateral grip bounded by the friction cone of the normal load
        f_lat = jnp.clip(-v_side / jnp.maximum(dt, 1e-4) * 80.0,
                         -1.2 * f_spring, 1.2 * f_spring)

        imp = (up * f_spring[..., None, :] + dirv * f_drive[..., None, :]
               + side_s * f_lat[..., None, :]) * dt * wm
        six = jnp.concatenate([imp, lm.cross(r, imp, axis=-2)], axis=-2)
        acc = jax.ops.segment_sum(jnp.moveaxis(six, -1, -2), bidx,
                                  num_segments=nb)
        acc = jnp.moveaxis(acc, -2, -1)            # [..,6,NB]
        inv_mass = jnp.asarray(st.inv_mass)
        iiw = P.inv_inertia_world_diag(rot, jnp.asarray(st.inv_inertia_body))
        vel = vel + acc[..., 0:3, :] * inv_mass[None, :]
        angvel = angvel + acc[..., 3:6, :] * iiw
        return vel, angvel

    def _terrain_bank(self):
        rmod = self.world.modules.get("renderer")
        return rmod.system.terrains.bank if rmod is not None else None

    def move_controller(self, state: WorldState, entity: int, disp) -> WorldState:
        """Queue a controller displacement (≙ PhysicsModule::moveController)."""
        slot = self.controllers.slot_of(entity)
        ms: PhysicsState = state.modules[self.name]
        ms = ms.replace(ctrl_disp=ms.ctrl_disp.at[..., :, slot].add(jnp.asarray(disp, jnp.float32)))
        return state.replace(modules={**state.modules, self.name: ms})

    def _update_controllers(self, state: WorldState, ms: PhysicsState, dt):
        """≙ physics_module.cpp updateControllers: manual gravity integration
        + move + ground clamp."""
        st = self.statics()
        if not st.ctrl_mask.any():
            return state, ms
        mask = jnp.asarray(st.ctrl_mask)
        vy = ms.ctrl_vel_y + jnp.asarray(st.ctrl_gravity) * dt
        pos = ms.ctrl_pos + ms.ctrl_disp
        pos = pos.at[..., 1, :].add(vy * dt)
        # ground/terrain clamp at the capsule foot
        if st.heightfield_terrain >= 0:
            from lumixengine_tpu.renderer import terrain as terr

            bank = self._terrain_bank()
            ox, oy, oz = st.heightfield_origin
            gy = terr.sample_height(bank, st.heightfield_terrain,
                                    pos[..., 0, :] - ox, pos[..., 2, :] - oz) + oy
        else:
            gy = jnp.full(pos.shape[:-2] + pos.shape[-1:], self.system.ground_y)
        below = pos[..., 1, :] <= gy
        grounded = below & mask
        pos = pos.at[..., 1, :].set(jnp.where(below, gy, pos[..., 1, :]))
        vy = jnp.where(grounded, 0.0, vy)
        ms = ms.replace(ctrl_pos=jnp.where(mask[None, :], pos, ms.ctrl_pos),
                        ctrl_vel_y=jnp.where(mask, vy, ms.ctrl_vel_y),
                        ctrl_disp=jnp.zeros_like(ms.ctrl_disp),
                        ctrl_grounded=grounded)
        # write controller entities' locals
        act = np.nonzero(st.ctrl_mask)[0].astype(np.int32)
        if act.size:
            eslots = jnp.asarray(st.ctrl_entity_slots[act])
            cols = jnp.asarray(act)
            local = state.local.replace(
                pos=state.local.pos.at[..., :, eslots].set(jnp.take(ms.ctrl_pos, cols, axis=-1))
            )
            state = state.replace(local=local)
        return state, ms

    def update(self, state: WorldState, dt) -> WorldState:
        """≙ physics_module.cpp update → updateDynamicActors: write simulated
        poses back into entity transforms (locals; propagation follows) +
        step character controllers."""
        st = self.statics()
        ms: PhysicsState = state.modules[self.name]
        state, ms = self._update_controllers(state, ms, jnp.asarray(dt, jnp.float32))
        state = state.replace(modules={**state.modules, self.name: ms})
        dyn_cols = np.nonzero(st.dyn_mask)[0].astype(np.int32)  # static, unique
        if dyn_cols.size == 0:
            return state
        ms = state.modules[self.name]
        eslots = jnp.asarray(st.entity_slots[dyn_cols])
        cols = jnp.asarray(dyn_cols)
        local = state.local.replace(
            pos=state.local.pos.at[..., :, eslots].set(jnp.take(ms.pos, cols, axis=-1)),
            rot=state.local.rot.at[..., :, eslots].set(jnp.take(ms.rot, cols, axis=-1)),
        )
        return state.replace(local=local)

    # -- queries (host-visible, also traceable) ---------------------------------

    def raycast(self, ms: PhysicsState, origin, direction, layer_mask: int = -1):
        """Batched ray vs every actor: exact spheres + OBB slab tests + exact
        convex hulls via support-interval slab clipping
        (≙ PhysicsModule::raycast with layer filtering)."""
        st = self.statics()
        mask = jnp.asarray(st.occupied)
        if layer_mask != -1:
            mask = mask & jnp.asarray((1 << st.layer) & layer_mask != 0)
        o = jnp.asarray(origin)
        d = jnp.asarray(direction)
        is_cvx = jnp.asarray(st.shape == P.SHAPE_CONVEX)
        hit, t, idx = P.raycast_all(o, d, ms.pos, ms.rot, jnp.asarray(st.shape),
                                    jnp.asarray(st.radius),
                                    jnp.asarray(st.half_extents),
                                    mask & ~is_cvx)
        if st.has_convex:
            from lumixengine_tpu.ops import convex_ops as CV
            hc, tc, ic = CV.raycast_convex(o, d, ms.pos, ms.rot, st.poly_axes,
                                           st.poly_axis_lo, st.poly_axis_hi,
                                           mask & is_cvx)
            pick_c = tc < t
            hit, t = hit | hc, jnp.minimum(t, tc)
            idx = jnp.where(pick_c, ic, idx)
        return hit, t, idx

    def sweep(self, ms: PhysicsState, origin, direction, sweep_radius: float,
              layer_mask: int = -1):
        """Sphere sweep vs every actor (≙ PhysicsModule::sweepSphere)."""
        st = self.statics()
        mask = jnp.asarray(st.occupied)
        if layer_mask != -1:
            mask = mask & jnp.asarray((1 << st.layer) & layer_mask != 0)
        return P.sweep(jnp.asarray(origin), jnp.asarray(direction),
                       jnp.float32(sweep_radius), ms.pos, ms.rot,
                       jnp.asarray(st.shape), jnp.asarray(st.radius),
                       jnp.asarray(st.half_extents), mask)


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
