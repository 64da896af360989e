import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumixengine_tpu.engine.engine import Engine
from lumixengine_tpu.physics.module import (
    MOTION_DYNAMIC, PhysicsModule, PhysicsSystem,
)


def build_world(actors=8, gravity=(0.0, -9.81, 0.0)):
    engine = Engine()
    engine.module_capacities = {"actors": actors}
    phys = PhysicsSystem(engine, gravity=gravity)
    engine.add_system(phys)
    world = engine.create_world(capacity=actors + 2)
    return engine, world, phys


def step_n(engine, world, state, n, dt=1 / 60):
    step = engine.build_step(world, donate=False)
    for _ in range(n):
        state = step(state, jnp.float32(dt))
    return state


def test_projectile_matches_closed_form():
    engine, world, phys = build_world()
    phys.ground_plane = False
    e = world.create_entity(position=(0.0, 100.0, 0.0))
    world.create_component(e, "rigid_actor", motion="dynamic", shape="sphere", radius=0.5)
    state = world.device_state()
    dt = 1 / 60
    n = 60
    state = step_n(engine, world, state, n, dt)
    ms = state.modules["physics"]
    slot = world.modules["physics"].actors.slot_of(e)
    y = float(ms.pos[1, slot])
    # semi-implicit Euler closed form with damping≈exp decay; use small-damping
    # analytic: y = y0 - g*dt^2*sum_{k=1..n} k ≈ y0 - g*dt^2*n(n+1)/2 (no damping)
    phys0 = PhysicsSystem(engine)  # defaults
    # reproduce integrator on host
    v = 0.0
    yy = 100.0
    for _ in range(n):
        v = (v - 9.81 * dt) * np.exp(-phys.linear_damping * dt)
        yy = yy + v * dt
    assert abs(y - yy) < 1e-3
    # entity transform followed the body (writeback + propagation)
    np.testing.assert_allclose(
        float(state.world.pos[1, world.slot(e)]), y, atol=1e-5
    )


def test_sphere_rests_on_ground():
    engine, world, phys = build_world()
    e = world.create_entity(position=(0.0, 2.0, 0.0))
    world.create_component(e, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.5, friction=0.5)
    state = world.device_state()
    state = step_n(engine, world, state, 240)
    ms = state.modules["physics"]
    slot = world.modules["physics"].actors.slot_of(e)
    # resting height = radius (within solver tolerance/slop)
    assert abs(float(ms.pos[1, slot]) - 0.5) < 0.02
    assert abs(float(ms.vel[1, slot])) < 0.05


def test_box_rests_on_ground_stably():
    engine, world, phys = build_world()
    e = world.create_entity(position=(0.0, 1.5, 0.0))
    world.create_component(e, "rigid_actor", motion="dynamic", shape="box",
                           half_extents=(0.5, 0.5, 0.5), friction=0.6)
    state = world.device_state()
    state = step_n(engine, world, state, 300)
    ms = state.modules["physics"]
    slot = world.modules["physics"].actors.slot_of(e)
    assert abs(float(ms.pos[1, slot]) - 0.5) < 0.03
    # box should not have tipped: up vector stays up
    from lumixengine_tpu.core import host_math as hm
    up = hm.quat_rotate(np.asarray(ms.rot[:, slot]), np.array([0, 1, 0], np.float32))
    assert up[1] > 0.99


def test_sphere_sphere_collision_momentum():
    engine, world, phys = build_world(gravity=(0.0, 0.0, 0.0))
    phys.ground_plane = False
    phys.linear_damping = 0.0
    a = world.create_entity(position=(-2.0, 0.0, 0.0))
    b = world.create_entity(position=(2.0, 0.0, 0.0))
    world.create_component(a, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.5, restitution=1.0, friction=0.0)
    world.create_component(b, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.5, restitution=1.0, friction=0.0)
    state = world.device_state()
    pm = world.modules["physics"]
    sa, sb = pm.actors.slot_of(a), pm.actors.slot_of(b)
    ms = state.modules["physics"]
    ms = ms.replace(vel=ms.vel.at[0, sa].set(4.0))  # a moves toward b
    state = state.replace(modules={**state.modules, "physics": ms})
    state = step_n(engine, world, state, 120)
    ms = state.modules["physics"]
    va = float(ms.vel[0, sa])
    vb = float(ms.vel[0, sb])
    # momentum conserved (equal masses): va+vb == 4
    assert abs((va + vb) - 4.0) < 0.05
    # elastic-ish: most energy transferred to b
    assert vb > 2.0


def test_stack_of_boxes_stays_stacked():
    engine, world, phys = build_world(actors=4)
    slots = []
    for i in range(3):
        e = world.create_entity(position=(0.0, 0.55 + i * 1.02, 0.0))
        world.create_component(e, "rigid_actor", motion="dynamic", shape="box",
                               half_extents=(0.5, 0.5, 0.5), friction=0.8)
        slots.append(e)
    state = world.device_state()
    state = step_n(engine, world, state, 300)
    ms = state.modules["physics"]
    pm = world.modules["physics"]
    ys = [float(ms.pos[1, pm.actors.slot_of(e)]) for e in slots]
    xs = [float(ms.pos[0, pm.actors.slot_of(e)]) for e in slots]
    # stack order preserved and roughly at rest heights 0.5/1.5/2.5
    for i, y in enumerate(ys):
        assert abs(y - (0.5 + i * 1.0)) < 0.15, (i, ys)
    for x in xs:
        assert abs(x) < 0.2, xs


def test_kinematic_body_follows_entity():
    engine, world, phys = build_world()
    e = world.create_entity(position=(0.0, 3.0, 0.0))
    world.create_component(e, "rigid_actor", motion="kinematic", shape="sphere", radius=0.5)
    state = world.device_state()
    # move the entity's local transform mid-sim; kinematic body must track it
    state = state.replace(
        local=state.local.replace(
            pos=state.local.pos.at[:, world.slot(e)].set(jnp.array([5.0, 3.0, 0.0]))
        )
    )
    state = step_n(engine, world, state, 2)
    ms = state.modules["physics"]
    slot = world.modules["physics"].actors.slot_of(e)
    np.testing.assert_allclose(np.asarray(ms.pos[:, slot]), [5.0, 3.0, 0.0], atol=1e-5)


def test_layer_matrix_filters_pairs():
    engine, world, phys = build_world(gravity=(0.0, 0.0, 0.0))
    phys.ground_plane = False
    phys.set_layers_collide(1, 2, False)
    a = world.create_entity(position=(-0.4, 0.0, 0.0))
    b = world.create_entity(position=(0.4, 0.0, 0.0))
    world.create_component(a, "rigid_actor", motion="dynamic", shape="sphere", radius=0.5, layer=1)
    world.create_component(b, "rigid_actor", motion="dynamic", shape="sphere", radius=0.5, layer=2)
    pm = world.modules["physics"]
    st = pm.statics()
    assert len(st.pair_a) == 0  # overlapping but filtered out


def test_distance_joint_holds_length():
    engine, world, phys = build_world(gravity=(0.0, -9.81, 0.0))
    phys.ground_plane = False
    anchor = world.create_entity(position=(0.0, 5.0, 0.0))
    bob = world.create_entity(position=(0.0, 3.0, 0.0))
    world.create_component(anchor, "rigid_actor", motion="static", shape="sphere", radius=0.1)
    world.create_component(bob, "rigid_actor", motion="dynamic", shape="sphere", radius=0.1)
    j = world.create_entity()
    world.create_component(j, "distance_joint", body_a=anchor, body_b=bob, length=2.0)
    state = world.device_state()
    state = step_n(engine, world, state, 240)
    ms = state.modules["physics"]
    pm = world.modules["physics"]
    pa = np.asarray(ms.pos[:, pm.actors.slot_of(anchor)])
    pb = np.asarray(ms.pos[:, pm.actors.slot_of(bob)])
    assert abs(np.linalg.norm(pb - pa) - 2.0) < 0.1


def test_raycast_hits_nearest():
    engine, world, phys = build_world(gravity=(0.0, 0.0, 0.0))
    a = world.create_entity(position=(0.0, 0.0, -5.0))
    b = world.create_entity(position=(0.0, 0.0, -10.0))
    world.create_component(a, "rigid_actor", shape="sphere", radius=1.0)
    world.create_component(b, "rigid_actor", shape="sphere", radius=1.0)
    pm = world.modules["physics"]
    state = world.device_state()
    hit, t, idx = pm.raycast(state.modules["physics"], jnp.zeros(3), jnp.array([0.0, 0.0, -1.0]))
    assert bool(hit)
    assert abs(float(t) - 4.0) < 1e-4
    assert int(idx) == pm.actors.slot_of(a)
