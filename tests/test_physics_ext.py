"""Extended physics: capsules, character controllers, joints, heightfields."""
import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_physics import build_world, step_n


def test_capsule_rests_on_ground():
    engine, world, phys = build_world()
    e = world.create_entity(position=(0.0, 3.0, 0.0))
    world.create_component(e, "rigid_actor", motion="dynamic", shape="capsule",
                           radius=0.3, half_extents=(0.3, 0.5, 0.3))  # hh=0.5
    state = world.device_state()
    state = step_n(engine, world, state, 300)
    ms = state.modules["physics"]
    slot = world.modules["physics"].actors.slot_of(e)
    # resting: capsule bottom endpoint at radius above ground → center ≈ hh + r
    y = float(ms.pos[1, slot])
    assert abs(y - 0.8) < 0.1, y


def test_capsule_sphere_collision():
    engine, world, phys = build_world(gravity=(0.0, 0.0, 0.0))
    phys.ground_plane = False
    phys.linear_damping = 0.0
    a = world.create_entity(position=(-2.0, 0.0, 0.0))
    b = world.create_entity(position=(1.0, 0.0, 0.0))
    world.create_component(a, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.5, friction=0.0)
    world.create_component(b, "rigid_actor", motion="dynamic", shape="capsule",
                           radius=0.4, half_extents=(0.4, 0.6, 0.4), friction=0.0)
    pm = world.modules["physics"]
    state = world.device_state()
    ms = state.modules["physics"]
    sa = pm.actors.slot_of(a)
    ms = ms.replace(vel=ms.vel.at[0, sa].set(3.0))
    state = state.replace(modules={**state.modules, "physics": ms})
    state = step_n(engine, world, state, 90)
    ms = state.modules["physics"]
    # capsule got pushed, sphere slowed
    assert float(ms.vel[0, pm.actors.slot_of(b)]) > 0.5
    assert float(ms.vel[0, sa]) < 3.0


def test_spherical_joint_pendulum():
    engine, world, phys = build_world()
    phys.ground_plane = False
    pivot = world.create_entity(position=(0.0, 5.0, 0.0))
    bob = world.create_entity(position=(1.5, 5.0, 0.0))
    world.create_component(pivot, "rigid_actor", motion="static", shape="sphere", radius=0.1)
    world.create_component(bob, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.2, mass=1.0)
    j = world.create_entity()
    world.create_component(j, "spherical_joint", body_a=pivot, body_b=bob,
                           anchor_a=(0.0, 0.0, 0.0), anchor_b=(-1.5, 0.0, 0.0))
    state = world.device_state()
    pm = world.modules["physics"]
    sb = pm.actors.slot_of(bob)
    ys = []
    step = engine.build_step(world, donate=False)
    for i in range(240):
        state = step(state, jnp.float32(1 / 60))
        ys.append(float(state.modules["physics"].pos[1, sb]))
    # bob swings below the pivot while the anchor distance stays ~1.5
    p = np.asarray(state.modules["physics"].pos[:, sb])
    anchor_world = p + np.array([-1.5, 0.0, 0.0]) @ np.eye(3) * 0  # anchor offset rotates; check distance instead
    dist = np.linalg.norm(p - np.array([0.0, 5.0, 0.0]))
    assert 1.0 < dist < 2.0, dist
    assert min(ys) < 4.6  # swung down


def test_hinge_joint_constrains_off_axis_spin():
    engine, world, phys = build_world(gravity=(0.0, 0.0, 0.0))
    phys.ground_plane = False
    phys.angular_damping = 0.0
    a = world.create_entity(position=(0.0, 0.0, 0.0))
    b = world.create_entity(position=(1.0, 0.0, 0.0))
    world.create_component(a, "rigid_actor", motion="static", shape="box",
                           half_extents=(0.2, 0.2, 0.2))
    world.create_component(b, "rigid_actor", motion="dynamic", shape="box",
                           half_extents=(0.3, 0.3, 0.3))
    j = world.create_entity()
    world.create_component(j, "hinge_joint", body_a=a, body_b=b, axis=(0, 1, 0),
                           anchor_a=(0.5, 0, 0), anchor_b=(-0.5, 0, 0))
    pm = world.modules["physics"]
    state = world.device_state()
    ms = state.modules["physics"]
    sb = pm.actors.slot_of(b)
    # spin around x (off-axis) and y (the hinge axis)
    ms = ms.replace(angvel=ms.angvel.at[:, sb].set(jnp.asarray([3.0, 2.0, 0.0])))
    state = state.replace(modules={**state.modules, "physics": ms})
    state = step_n(engine, world, state, 60)
    w = np.asarray(state.modules["physics"].angvel[:, sb])
    assert abs(w[0]) < 0.1    # off-axis spin killed
    # spin about the hinge axis survives (partly converted to orbiting the
    # anchor by the point constraint — correct hinge behavior)
    assert w[1] > 0.2


def test_character_controller_walks_and_grounds():
    engine, world, phys = build_world()
    c = world.create_entity(position=(0.0, 3.0, 0.0), name="player")
    world.create_component(c, "physics_controller", radius=0.4, height=1.8)
    pm = world.modules["physics"]
    step = engine.build_step(world, donate=False)
    state = world.device_state()
    # fall to the ground under manual gravity
    for _ in range(120):
        state = step(state, jnp.float32(1 / 60))
    ms = state.modules["physics"]
    slot = pm.controllers.slot_of(c)
    assert bool(ms.ctrl_grounded[slot])
    assert abs(float(ms.ctrl_pos[1, slot])) < 1e-3
    # move laterally
    for _ in range(30):
        state = pm.move_controller(state, c, (0.1, 0.0, 0.0))
        state = step(state, jnp.float32(1 / 60))
    ms = state.modules["physics"]
    assert float(ms.ctrl_pos[0, slot]) > 2.5
    # entity followed
    np.testing.assert_allclose(float(state.world.pos[0, world.slot(c)]),
                               float(ms.ctrl_pos[0, slot]), atol=1e-4)


def test_heightfield_contacts():
    from lumixengine_tpu import app as app_mod

    engine = app_mod.create_full_engine(actors=8)
    renderer = engine.system_manager.get_system("renderer_system")
    hm = np.zeros((16, 16), np.float32)
    hm[:, :] = 2.0  # flat plateau at y=2
    tid = renderer.terrains.add(hm)
    world = engine.create_world(capacity=16)
    hf = world.create_entity(position=(-8.0, 0.0, -8.0))
    world.create_component(hf, "heightfield", terrain=tid)
    ball = world.create_entity(position=(0.0, 6.0, 0.0))
    world.create_component(ball, "rigid_actor", motion="dynamic", shape="sphere", radius=0.5)
    pm = world.modules["physics"]
    state = world.device_state()
    state = step_n(engine, world, state, 300)
    ms = state.modules["physics"]
    y = float(ms.pos[1, pm.actors.slot_of(ball)])
    assert abs(y - 2.5) < 0.1, y  # rests on the plateau, not the y=0 plane


def test_box_raycast():
    from lumixengine_tpu.ops import physics_ops as P

    pos = jnp.asarray(np.array([[0.0, 3.0], [0.0, 0.0], [-5.0, -9.0]], np.float32))
    rot = jnp.zeros((4, 2)).at[3].set(1.0)
    he = jnp.full((3, 2), 1.0)
    hit, t, idx = P.raycast_boxes(jnp.zeros(3), jnp.asarray([0.0, 0.0, -1.0]),
                                  pos, rot, he, jnp.asarray([True, True]))
    assert bool(hit) and abs(float(t) - 4.0) < 1e-5 and int(idx) == 0


def test_fused_pallas_solver_parity():
    """solver_pallas is parity-exact with the jnp solver (interpret mode)."""
    import jax
    from lumixengine_tpu.ops import physics_ops as P
    from lumixengine_tpu.ops.solver_pallas import solve_contacts_fused

    engine, world, phys = build_world(actors=8)
    for i in range(4):
        e = world.create_entity(position=(i * 0.9, 1.0 + 0.4 * i, 0.0))
        world.create_component(e, "rigid_actor", motion="dynamic",
                               shape=["box", "sphere"][i % 2],
                               half_extents=(0.5, 0.5, 0.5), radius=0.45)
    pm = world.modules["physics"]
    st = pm.statics()
    ms = world.device_state().modules["physics"]
    key = jax.random.PRNGKey(3)
    vel = jax.random.normal(key, ms.vel.shape) * 0.5
    ang = jax.random.normal(jax.random.fold_in(key, 1), ms.angvel.shape) * 0.2
    shape = jnp.asarray(st.shape)
    radius = jnp.asarray(st.radius)
    he = jnp.asarray(st.half_extents)
    dyn = jnp.asarray(st.dyn_mask)
    gc = P.ground_contacts(ms.pos, ms.rot, shape, radius, he, dyn)
    pc = P.pair_contacts(ms.pos, ms.rot, st.shape, radius, he, st.pair_a, st.pair_b)
    c = P.concat_contacts(gc, pc)
    iiw = P.inv_inertia_world_diag(ms.rot, jnp.asarray(st.inv_inertia_body))
    args = (ms.pos, ms.rot, vel, ang, c, st.inv_mass, iiw,
            st.incidence_a, st.incidence_b, 1 / 60, st.friction, st.restitution)
    v1, w1 = P.solve_contacts(*args, iterations=8)
    v2, w2 = solve_contacts_fused(*args, iterations=8, interpret=True)
    # summation order differs (6-row fused accumulators) → fp-level tolerance
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=5e-3)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=5e-3)

    # fused in-kernel position projection == project_positions (dpos depends
    # only on the contact set, so pos + dpos after integration is exact)
    *_, dpos = solve_contacts_fused(*args, iterations=8, interpret=True,
                                    position_iterations=3, return_dpos=True)
    p_ref = P.project_positions(ms.pos, c, st.inv_mass,
                                st.incidence_a, st.incidence_b, iterations=3)
    np.testing.assert_allclose(np.asarray(ms.pos + dpos), np.asarray(p_ref),
                               atol=5e-3)


# ---------------------------------------------------------------------------
# vehicles (≙ physics_module.cpp updateVehicles — raycast suspension model)

def _build_vehicle():
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem

    engine = Engine()
    engine.module_capacities = {"actors": 4}
    phys = PhysicsSystem(engine)
    engine.add_system(phys)
    world = engine.create_world(capacity=8)
    car = world.create_entity(position=(0.0, 0.8, 0.0), name="car")
    world.create_component(car, "vehicle", mass=1200.0, peak_torque=800.0,
                           chassis_half_extents=(0.9, 0.4, 2.0))
    for i, (x, z, slot) in enumerate([(-0.8, 1.4, 0), (0.8, 1.4, 1),
                                      (-0.8, -1.4, 2), (0.8, -1.4, 3)]):
        w = world.create_entity(position=(x, -0.45, z), parent=car)
        world.create_component(w, "wheel", slot=slot, radius=0.35,
                               max_droop=0.2, max_compression=0.2,
                               spring_strength=60000.0,
                               spring_damper_rate=6000.0)
    return engine, world, car


def test_vehicle_suspension_holds_chassis_up():
    engine, world, car = _build_vehicle()
    pm = world.modules["physics"]
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(240):
        s = step(s, jnp.float32(1 / 60))
    slot = pm.actors.slot_of(car)
    y = float(s.modules["physics"].pos[1, slot])
    # suspension supports the chassis near anchor height + rest length
    assert 0.5 < y < 1.2, y
    vy = float(s.modules["physics"].vel[1, slot])
    assert abs(vy) < 0.2, vy


def test_vehicle_drives_forward_and_steers():
    engine, world, car = _build_vehicle()
    pm = world.modules["physics"]
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(60):  # settle on suspension
        s = step(s, jnp.float32(1 / 60))
    s = pm.set_vehicle_input(s, car, throttle=1.0, steer=0.0)
    for _ in range(120):
        s = step(s, jnp.float32(1 / 60))
    slot = pm.actors.slot_of(car)
    ms = s.modules["physics"]
    assert float(ms.vel[2, slot]) > 1.0, float(ms.vel[2, slot])  # accelerates +z
    z0 = float(ms.pos[2, slot])
    assert z0 > 0.5
    # steer: yaw rate appears and the path curves
    s = pm.set_vehicle_input(s, car, throttle=0.6, steer=0.4)
    for _ in range(120):
        s = step(s, jnp.float32(1 / 60))
    ms = s.modules["physics"]
    assert abs(float(ms.angvel[1, slot])) > 0.05       # yawing
    assert abs(float(ms.pos[0, slot])) > 0.3           # lateral displacement


# ---------------------------------------------------------------------------
# joint limits + drives (≙ PxRevoluteJoint AngularLimitPair + drive,
# PxDistanceJoint min/maxDistance)

def test_hinge_drive_spins_body():
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem

    engine = Engine()
    engine.module_capacities = {"actors": 4, "joints": 4}
    phys = PhysicsSystem(engine, gravity=(0.0, 0.0, 0.0))
    phys.ground_plane = False
    engine.add_system(phys)
    world = engine.create_world(capacity=8)
    a = world.create_entity(position=(0.0, 2.0, 0.0))
    world.create_component(a, "rigid_actor", motion="static", shape="box")
    b = world.create_entity(position=(0.0, 2.0, 0.0))
    world.create_component(b, "rigid_actor", motion="dynamic", shape="box")
    j = world.create_entity()
    world.create_component(j, "hinge_joint", body_a=a, body_b=b,
                           axis=(0.0, 1.0, 0.0), drive_velocity=3.0,
                           drive_force=1e6)
    pm = world.modules["physics"]
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(120):
        s = step(s, jnp.float32(1 / 60))
    wy = float(s.modules["physics"].angvel[1, pm.actors.slot_of(b)])
    assert 2.0 < wy < 4.0, wy  # spun up toward the drive target


def test_hinge_limit_stops_rotation():
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem

    engine = Engine()
    engine.module_capacities = {"actors": 4, "joints": 4}
    phys = PhysicsSystem(engine, gravity=(0.0, 0.0, 0.0))
    phys.ground_plane = False
    phys.angular_damping = 0.0
    engine.add_system(phys)
    world = engine.create_world(capacity=8)
    a = world.create_entity(position=(0.0, 2.0, 0.0))
    world.create_component(a, "rigid_actor", motion="static", shape="box")
    b = world.create_entity(position=(0.0, 2.0, 0.0))
    world.create_component(b, "rigid_actor", motion="dynamic", shape="box")
    j = world.create_entity()
    world.create_component(j, "hinge_joint", body_a=a, body_b=b,
                           axis=(0.0, 1.0, 0.0), limit=(-0.5, 0.5))
    pm = world.modules["physics"]
    slot = pm.actors.slot_of(b)
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    ms = s.modules["physics"]
    ms = ms.replace(angvel=ms.angvel.at[1, slot].set(4.0))  # spin into the limit
    s = s.replace(modules={**s.modules, "physics": ms})
    for _ in range(240):
        s = step(s, jnp.float32(1 / 60))
    from lumixengine_tpu.core import host_math as hm
    q = np.asarray(s.modules["physics"].rot[:, slot])
    angle = 2.0 * np.arctan2(q[1], q[3])
    assert abs(angle) < 0.7, angle   # held near the 0.5 rad limit, not spinning
    wy = float(s.modules["physics"].angvel[1, slot])
    assert abs(wy) < 0.5, wy


def test_distance_band_joint():
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem

    engine = Engine()
    engine.module_capacities = {"actors": 4, "joints": 4}
    phys = PhysicsSystem(engine)
    phys.ground_plane = False
    engine.add_system(phys)
    world = engine.create_world(capacity=8)
    a = world.create_entity(position=(0.0, 5.0, 0.0))
    world.create_component(a, "rigid_actor", motion="static", shape="sphere", radius=0.1)
    b = world.create_entity(position=(0.0, 4.5, 0.0))
    world.create_component(b, "rigid_actor", motion="dynamic", shape="sphere", radius=0.1)
    j = world.create_entity()
    world.create_component(j, "distance_joint", body_a=a, body_b=b,
                           min_distance=0.2, max_distance=1.0)
    pm = world.modules["physics"]
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(240):
        s = step(s, jnp.float32(1 / 60))
    y = float(s.modules["physics"].pos[1, pm.actors.slot_of(b)])
    # hangs at the 1.0 band edge below the anchor (within solver tolerance)
    assert 3.85 < y < 4.1, y


@pytest.mark.slow  # 18 s: the unwarmed vmap parity variant stays in the fast gate
def test_fused_pallas_solver_warm_vmap_parity():
    """Warm-started, vmapped fused solver matches the jnp oracle — this is
    exactly how the engine step invokes it (per-world under vmap)."""
    import jax
    from lumixengine_tpu.ops import physics_ops as P
    from lumixengine_tpu.ops.solver_pallas import solve_contacts_fused

    engine, world, phys = build_world(actors=8)
    for i in range(4):
        e = world.create_entity(position=(i * 0.9, 1.0 + 0.4 * i, 0.0))
        world.create_component(e, "rigid_actor", motion="dynamic",
                               shape=["box", "sphere"][i % 2],
                               half_extents=(0.5, 0.5, 0.5), radius=0.45)
    pm = world.modules["physics"]
    st = pm.statics()
    ms = world.device_state().modules["physics"]
    key = jax.random.PRNGKey(7)
    W = 3
    pos = jnp.broadcast_to(ms.pos, (W,) + ms.pos.shape) \
        + jax.random.normal(key, (W, 1, ms.pos.shape[-1])) * 0.01
    rot = jnp.broadcast_to(ms.rot, (W,) + ms.rot.shape)
    vel = jax.random.normal(jax.random.fold_in(key, 1), (W,) + ms.vel.shape) * 0.5
    ang = jax.random.normal(jax.random.fold_in(key, 2), (W,) + ms.angvel.shape) * 0.2

    def contacts_of(p, r):
        shape = jnp.asarray(st.shape)
        radius = jnp.asarray(st.radius)
        he = jnp.asarray(st.half_extents)
        dyn = jnp.asarray(st.dyn_mask)
        gc = P.ground_contacts(p, r, shape, radius, he, dyn)
        pc = P.pair_contacts(p, r, st.shape, radius, he, st.pair_a, st.pair_b)
        return P.concat_contacts(gc, pc)

    c0 = contacts_of(ms.pos, ms.rot)
    nC = c0.depth.shape[-1]
    warm = tuple(jax.random.uniform(jax.random.fold_in(key, 3 + i), (W, nC)) * 0.1
                 for i in range(3))

    def solve_one(fused):
        def f(p, r, v, w, wl):
            c = contacts_of(p, r)
            iiw = P.inv_inertia_world_diag(r, jnp.asarray(st.inv_inertia_body))
            fn = solve_contacts_fused if fused else P.solve_contacts
            kw = {"interpret": True} if fused else {}
            v2, w2, lams = fn(p, r, v, w, c, st.inv_mass, iiw,
                              st.incidence_a, st.incidence_b, 1 / 60,
                              st.friction, st.restitution, iterations=6,
                              warm_lambdas=wl, return_lambdas=True, **kw)
            return v2, w2, lams
        return jax.vmap(f)(pos, rot, vel, ang, warm)

    v1, w1, l1 = solve_one(False)
    v2, w2, l2 = solve_one(True)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=5e-3)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=5e-3)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_pruned_broadphase_matches_allpairs():
    """The compacted-pair broadphase must reproduce the all-pairs solve when
    the budget covers every overlapping pair (same scene, same steps)."""
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem

    def build(broadphase):
        engine = Engine()
        engine.module_capacities = {"actors": 16}
        phys = PhysicsSystem(engine)
        engine.add_system(phys)
        world = engine.create_world(capacity=32)
        rng = np.random.default_rng(5)
        for i in range(10):
            e = world.create_entity(position=(float(rng.uniform(-2, 2)),
                                              1.0 + 0.7 * i,
                                              float(rng.uniform(-2, 2))))
            world.create_component(e, "rigid_actor", motion="dynamic",
                                   shape=["box", "sphere"][i % 2],
                                   half_extents=(0.4, 0.4, 0.4), radius=0.4,
                                   mass=1.0 + i * 0.1)
        pm = world.modules["physics"]
        pm.broadphase = broadphase
        pm.pair_budget = 64
        pm.invalidate_statics()
        step = engine.build_step(world, donate=False)
        s = world.device_state()
        for _ in range(120):
            s = step(s, jnp.float32(1 / 60))
        return np.asarray(s.modules["physics"].pos), \
            np.asarray(s.modules["physics"].rot), pm.statics(), s

    pos_a, rot_a, _, _ = build("allpairs")
    pos_p, rot_p, stp, sp = build("pruned")
    assert stp.pruned
    # identical scene physics (compaction covers all overlaps; solver sees
    # the same active contacts — tolerances cover fp reassociation)
    np.testing.assert_allclose(pos_p, pos_a, atol=5e-2)
    assert int(sp.modules["physics"].counters["pruned_pair_miss"]) == 0


def test_pruned_warm_start_survives_slot_churn():
    """Top-k compaction renumbers compacted slots when the overlap set churns;
    warm lambdas must be dropped for reassigned slots (gated by pair_key in
    PhysicsState) instead of applying a stale pair's impulse to the new
    occupant — that pops bodies on churn frames.  A dropping ball joins a
    resting pair's overlap set mid-run (churn): the resting pair must not
    gain energy on the churn frame."""
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem

    engine = Engine()
    engine.module_capacities = {"actors": 16}
    phys = PhysicsSystem(engine)
    engine.add_system(phys)
    world = engine.create_world(capacity=32)
    # resting stack (persistent contacts, big accumulated normal impulses)
    stack = []
    for i in range(2):
        e = world.create_entity(position=(0.0, 0.5 + 1.001 * i, 0.0))
        world.create_component(e, "rigid_actor", motion="dynamic",
                               shape="box", half_extents=(0.5, 0.5, 0.5),
                               mass=1.0)
        stack.append(e)
    # a ball that enters the broadphase overlap set later (x sorts it BEFORE
    # the stack's pairs in the static candidate list → compaction renumbers)
    ball = world.create_entity(position=(-3.0, 8.0, 0.0))
    world.create_component(ball, "rigid_actor", motion="dynamic",
                           shape="sphere", radius=0.5, mass=1.0)
    pm = world.modules["physics"]
    pm.broadphase = "pruned"
    pm.pair_budget = 2            # tight: churn forces real renumbering
    pm.invalidate_statics()
    assert pm.statics().pruned
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(240):
        s = step(s, jnp.float32(1 / 60))
    ms = s.modules["physics"]
    assert np.asarray(ms.pair_key).shape == (2,)
    p = np.asarray(ms.pos)
    slots = [pm.actors.slot_of(e) for e in stack]
    # the stack is still a resting 2-stack: no churn-frame impulse pop
    assert abs(p[1, slots[0]] - 0.5) < 0.05, p[:, slots]
    assert abs(p[1, slots[1]] - 1.5) < 0.08, p[:, slots]
    v = np.asarray(ms.vel)[:, slots]
    assert np.abs(v).max() < 0.2, v


def test_pruned_budget_overflow_counter():
    """When more pairs overlap than the budget, the overflow counter fires."""
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem

    engine = Engine()
    engine.module_capacities = {"actors": 16}
    phys = PhysicsSystem(engine)
    engine.add_system(phys)
    world = engine.create_world(capacity=32)
    # 8 spheres in one tight clump: 28 overlapping pairs
    for i in range(8):
        e = world.create_entity(position=(0.02 * i, 0.5 + 0.05 * i, 0.0))
        world.create_component(e, "rigid_actor", motion="dynamic",
                               shape="sphere", radius=0.5)
    pm = world.modules["physics"]
    pm.broadphase = "pruned"
    pm.pair_budget = 4
    pm.invalidate_statics()
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    s = step(s, jnp.float32(1 / 60))
    assert int(s.modules["physics"].counters["pruned_pair_miss"]) > 0


def test_d6_per_axis_motion_config():
    """d6 joints with per-axis motions (≙ PxD6Joint setMotion): a vertical
    prismatic d6 (y free, x/z locked, all angular locked) slides down under
    gravity while staying laterally pinned and unrotated."""
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem

    engine = Engine()
    engine.module_capacities = {"actors": 4, "joints": 4}
    phys = PhysicsSystem(engine)
    phys.ground_plane = False
    # anchor and slider share space: filter their collision (layer matrix)
    phys.layer_matrix[0, 1] = phys.layer_matrix[1, 0] = False
    engine.add_system(phys)
    world = engine.create_world(capacity=8)
    a = world.create_entity(position=(0.0, 5.0, 0.0))
    world.create_component(a, "rigid_actor", motion="static", shape="box")
    b = world.create_entity(position=(0.3, 5.0, 0.2))
    world.create_component(b, "rigid_actor", motion="dynamic", shape="box",
                           mass=1.0, layer=1)
    j = world.create_entity()
    world.create_component(j, "d6_joint", body_a=a, body_b=b,
                           linear_motion=(1, 0, 1),     # y slides free
                           angular_motion=(1, 1, 1))    # fully unrotating
    pm = world.modules["physics"]
    slot = pm.actors.slot_of(b)
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    ms0 = s.modules["physics"]
    s = s.replace(modules={**s.modules, "physics": ms0.replace(
        angvel=ms0.angvel.at[1, slot].set(2.0))})       # try to spin it
    for _ in range(120):
        s = step(s, jnp.float32(1 / 60))
    ms = s.modules["physics"]
    # fell freely along y
    assert float(ms.pos[1, slot]) < 3.0
    # pinned laterally to the anchor line (x/z locked pull toward the anchor)
    assert abs(float(ms.pos[0, slot])) < 0.15
    assert abs(float(ms.pos[2, slot])) < 0.15
    # angular lock killed the injected spin
    assert abs(float(ms.angvel[1, slot])) < 0.1


# -- instanced static collision (InstancedCube / InstancedMesh) --------------
# ≙ reference physics_module.h:342,349 //@ component InstancedCube /
# InstancedMesh; initInstancedCubes/initInstancedMeshes
# (physics_module.cpp:2173-2244) create one static actor per render
# InstancedModel instance at owner translation + instance offset.

def _engine_with_renderer(ground=False):
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem
    from lumixengine_tpu.renderer.render_module import RendererSystem
    from lumixengine_tpu.renderer.model import Model

    engine = Engine()
    engine.module_capacities = {"actors": 8}
    renderer = RendererSystem(engine)
    renderer.add_model(Model(
        name="physcube", bounding_radius=0.87, material_id=0,
        vertex_positions=np.array(
            [[sx, sy, sz] for sx in (-0.5, 0.5) for sy in (-0.5, 0.5)
             for sz in (-0.5, 0.5)], np.float32)))
    engine.add_system(renderer)
    phys = PhysicsSystem(engine)
    phys.ground_plane = ground
    engine.add_system(phys)
    world = engine.create_world(capacity=16)
    return engine, world


def test_instanced_cube_static_collision():
    engine, world = _engine_with_renderer(ground=False)
    e = world.create_entity(position=(0.0, 0.0, 0.0))
    pts = np.array([[-3.0, 0.0, 0.0], [0.0, 0.0, 0.0], [3.0, 0.0, 0.0]],
                   np.float32)
    world.create_component(e, "instanced_model", model="physcube", count=3,
                           positions=pts)
    world.create_component(e, "instanced_cube", half_extents=(0.5, 0.5, 0.5))
    ball = world.create_entity(position=(0.0, 3.0, 0.0))
    world.create_component(ball, "rigid_actor", motion="dynamic",
                           shape="sphere", radius=0.5, mass=1.0)
    pm = world.modules["physics"]
    st = pm.statics()
    assert st.n_instanced == 3          # one static slot per instance
    assert st.nb == pm.actors.capacity + 3
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(240):
        s = step(s, jnp.float32(1 / 60))
    ms = s.modules["physics"]
    y = float(ms.pos[1, pm.actors.slot_of(ball)])
    # rests ON the middle instanced cube (top 0.5 + radius 0.5), does not
    # fall past it (no ground plane below)
    assert 0.9 < y < 1.1, y
    # the instanced statics never moved
    assert np.allclose(np.asarray(ms.pos)[:, -3:], st.inst_pos, atol=1e-5)


def test_instanced_mesh_static_collision_and_roundtrip():
    engine, world = _engine_with_renderer(ground=False)
    e = world.create_entity(position=(0.0, 0.0, 0.0))
    world.create_component(e, "instanced_model", model="physcube", count=2,
                           positions=np.array([[0.0, 0.0, 0.0],
                                               [4.0, 0.0, 0.0]], np.float32),
                           scales=np.full((2, 3), 2.0, np.float32))
    world.create_component(e, "instanced_mesh", mesh="physcube")
    ball = world.create_entity(position=(0.0, 4.0, 0.0))
    world.create_component(ball, "rigid_actor", motion="dynamic",
                           shape="sphere", radius=0.5, mass=1.0)
    pm = world.modules["physics"]
    st = pm.statics()
    assert st.n_instanced == 2
    # scaled cooked hull: 2x scale -> half-extent 1.0
    assert abs(float(st.half_extents[1, -1]) - 1.0) < 0.05
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(240):
        s = step(s, jnp.float32(1 / 60))
    y = float(s.modules["physics"].pos[1, pm.actors.slot_of(ball)])
    assert 1.35 < y < 1.6, y            # hull top 1.0 + radius 0.5 - slop
    # serialization keeps both instanced components
    from lumixengine_tpu.engine import serialize as ser
    blob = ser.serialize_world(world)
    engine2, _ = _engine_with_renderer(ground=False)
    w2 = ser.load_world(engine2, blob)
    pm2 = w2.modules["physics"]
    assert len(pm2.instanced_meshes) == 1
    assert pm2.statics().n_instanced == 2
