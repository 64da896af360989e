"""Convex hulls + SDF triangle-mesh colliders (≙ reference
src/physics/physics_system.cpp:202-213 cookConvex/cookTriMesh and PhysX
convex/trimesh geoms; here cooking is physics/cooking.py and the narrowphase
is ops/convex_ops.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from lumixengine_tpu.physics.cooking import cook_convex, cook_mesh_sdf

CUBE_CLOUD = np.array([[sx, sy, sz] for sx in (-0.5, 0.5)
                       for sy in (-0.5, 0.5) for sz in (-0.5, 0.5)], np.float32)


def _engine(gravity=(0.0, -9.81, 0.0), ground=True):
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem

    engine = Engine()
    engine.module_capacities = {"actors": 8}
    phys = PhysicsSystem(engine, gravity=gravity)
    phys.ground_plane = ground
    engine.add_system(phys)
    world = engine.create_world(capacity=16)
    return engine, world


def test_cooked_cube_properties():
    h = cook_convex(CUBE_CLOUD)
    assert h.n_verts == 8 and h.n_faces == 3
    assert abs(h.volume - 1.0) < 1e-6
    # unit cube inertia at unit density: 1/12*(1+1)
    np.testing.assert_allclose(h.inertia_diag, 1.0 / 6.0, atol=1e-5)


def test_convex_cube_rests_on_ground():
    engine, world = _engine()
    e = world.create_entity(position=(0.0, 2.0, 0.0))
    world.create_component(e, "rigid_actor", motion="dynamic", shape="convex",
                           points=CUBE_CLOUD, mass=2.0)
    pm = world.modules["physics"]
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(240):
        s = step(s, jnp.float32(1 / 60))
    slot = pm.actors.slot_of(e)
    ms = s.modules["physics"]
    y = float(ms.pos[1, slot])
    assert 0.46 < y < 0.56, y  # face down at half-extent height
    assert abs(float(ms.vel[1, slot])) < 0.05
    assert not bool(np.any(np.isnan(np.asarray(ms.pos))))


def test_convex_tetra_rests_not_bounding_sphere():
    # a tetra's bounding sphere is much bigger than the hull — resting height
    # must reflect the actual face, proving SAT uses the real geometry
    tet = np.array([[0.0, 0.5, 0.0], [0.5, -0.5, 0.5],
                    [-0.5, -0.5, 0.5], [0.0, -0.5, -0.5]], np.float32)
    engine, world = _engine()
    e = world.create_entity(position=(0.0, 2.0, 0.0))
    world.create_component(e, "rigid_actor", motion="dynamic", shape="convex",
                           points=tet, mass=1.0)
    pm = world.modules["physics"]
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(300):
        s = step(s, jnp.float32(1 / 60))
    y = float(s.modules["physics"].pos[1, pm.actors.slot_of(e)])
    # center ends between the lowest vert (-0.5) and the apex; bounding-sphere
    # resting would park the center at ~bound_radius (≥0.7)
    assert 0.35 < y < 0.62, y


def test_convex_stacks_on_box():
    engine, world = _engine()
    base = world.create_entity(position=(0.0, 0.5, 0.0))
    world.create_component(base, "rigid_actor", motion="static", shape="box",
                           half_extents=(1.0, 0.5, 1.0))
    top = world.create_entity(position=(0.0, 2.5, 0.0))
    world.create_component(top, "rigid_actor", motion="dynamic", shape="convex",
                           points=CUBE_CLOUD, mass=1.0)
    pm = world.modules["physics"]
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(300):
        s = step(s, jnp.float32(1 / 60))
    y = float(s.modules["physics"].pos[1, pm.actors.slot_of(top)])
    assert 1.42 < y < 1.56, y  # box top (1.0) + half cube (0.5) - slop


def test_convex_pair_convex():
    engine, world = _engine()
    a = world.create_entity(position=(0.0, 0.5, 0.0))
    world.create_component(a, "rigid_actor", motion="static", shape="convex",
                           points=CUBE_CLOUD)
    b = world.create_entity(position=(0.05, 1.52, 0.0))
    world.create_component(b, "rigid_actor", motion="dynamic", shape="convex",
                           points=CUBE_CLOUD, mass=1.0)
    pm = world.modules["physics"]
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(300):
        s = step(s, jnp.float32(1 / 60))
    ms = s.modules["physics"]
    y = float(ms.pos[1, pm.actors.slot_of(b)])
    assert 1.42 < y < 1.56, y  # static hull top (1.0) + half cube (0.5)


def test_sphere_vs_convex_ground_mix():
    # sphere handled by the polytope path when paired against a hull
    engine, world = _engine()
    a = world.create_entity(position=(0.0, 0.5, 0.0))
    world.create_component(a, "rigid_actor", motion="static", shape="convex",
                           points=CUBE_CLOUD)
    b = world.create_entity(position=(0.0, 2.0, 0.0))
    world.create_component(b, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.3, mass=1.0)
    pm = world.modules["physics"]
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(300):
        s = step(s, jnp.float32(1 / 60))
    y = float(s.modules["physics"].pos[1, pm.actors.slot_of(b)])
    assert 1.22 < y < 1.36, y  # hull top (1.0) + sphere radius (0.3)


CUBE_MESH_V = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (0, 1)
                        for sz in (-1, 1)], np.float32)
CUBE_MESH_T = np.array([
    [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
    [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
    [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])


def test_sdf_mesh_collider_sphere_rest():
    # a 2x1x2 box mesh baked to SDF; a sphere dropped above rests on its top
    engine, world = _engine(ground=False)
    mc = world.create_entity(position=(0.0, 0.0, 0.0))
    world.create_component(mc, "mesh_collider", vertices=CUBE_MESH_V,
                           triangles=CUBE_MESH_T, resolution=24)
    b = world.create_entity(position=(0.1, 3.0, 0.1))
    world.create_component(b, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.25, mass=1.0)
    pm = world.modules["physics"]
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(300):
        s = step(s, jnp.float32(1 / 60))
    ms = s.modules["physics"]
    y = float(ms.pos[1, pm.actors.slot_of(b)])
    # mesh top y=1 + radius 0.25, SDF grid tolerance ~1 cell (2/24)
    assert 1.1 < y < 1.42, y
    assert abs(float(ms.vel[1, pm.actors.slot_of(b)])) < 0.1


def test_sdf_mesh_collider_box_rest():
    engine, world = _engine(ground=False)
    mc = world.create_entity()
    world.create_component(mc, "mesh_collider", vertices=CUBE_MESH_V,
                           triangles=CUBE_MESH_T, resolution=24)
    b = world.create_entity(position=(0.0, 3.0, 0.0))
    world.create_component(b, "rigid_actor", motion="dynamic", shape="box",
                           half_extents=(0.3, 0.3, 0.3), mass=1.0)
    pm = world.modules["physics"]
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(300):
        s = step(s, jnp.float32(1 / 60))
    y = float(s.modules["physics"].pos[1, pm.actors.slot_of(b)])
    assert 1.15 < y < 1.5, y


def test_raycast_convex_exact():
    """Convex raycasts are exact (support-interval slab clipping), not
    bounding-sphere: the cube hull face at z=-0.5 is hit at t=4.5, and a
    ray grazing past the corner (inside the bounding sphere) misses."""
    engine, world = _engine()
    e = world.create_entity(position=(0.0, 1.0, 0.0))
    world.create_component(e, "rigid_actor", motion="static", shape="convex",
                           points=CUBE_CLOUD)
    pm = world.modules["physics"]
    s = world.device_state()
    hit, t, idx = pm.raycast(s.modules["physics"],
                             jnp.asarray([0.0, 1.0, -5.0]),
                             jnp.asarray([0.0, 0.0, 1.0]))
    assert bool(hit)
    assert abs(float(t) - 4.5) < 1e-3, float(t)   # exact face, not bound sphere
    # x=0.7: outside the unit cube (hx=0.5) but inside its bounding sphere
    hit2, t2, _ = pm.raycast(s.modules["physics"],
                             jnp.asarray([0.7, 1.0, -5.0]),
                             jnp.asarray([0.0, 0.0, 1.0]))
    assert not bool(hit2)
    # tetra: asymmetric hull, ray from above hits the apex-side face exactly
    tet = np.array([[0.0, 0.5, 0.0], [0.5, -0.5, 0.5],
                    [-0.5, -0.5, 0.5], [0.0, -0.5, -0.5]], np.float32)
    e2 = world.create_entity(position=(5.0, 1.0, 0.0))
    world.create_component(e2, "rigid_actor", motion="static", shape="convex",
                           points=tet)
    pm.invalidate_statics()
    s = world.device_state()
    hit3, t3, i3 = pm.raycast(s.modules["physics"],
                              jnp.asarray([5.0, 4.0, 0.0]),
                              jnp.asarray([0.0, -1.0, 0.0]))
    assert bool(hit3)
    assert abs(float(t3) - 2.5) < 5e-2, float(t3)  # apex at y=1.5


def test_ccd_prevents_tunneling_through_thin_mesh():
    """A fast sphere (2.5 m per step) vs a thin SDF slab: without CCD it
    tunnels straight through; with ccd=True it stops at the surface
    (≙ PxRigidBodyFlag::eENABLE_CCD)."""
    # thin slab: 4x0.2x4 box mesh at y=0
    sv = np.array([[sx, sy, sz] for sx in (-2, 2) for sy in (-0.1, 0.1)
                   for sz in (-2, 2)], np.float32)
    st_ = CUBE_MESH_T

    def run(ccd):
        engine, world = _engine(ground=False)
        mc = world.create_entity()
        world.create_component(mc, "mesh_collider", vertices=sv, triangles=st_,
                               resolution=24)
        b = world.create_entity(position=(0.0, 3.0, 0.0))
        world.create_component(b, "rigid_actor", motion="dynamic",
                               shape="sphere", radius=0.2, mass=1.0, ccd=ccd)
        pm = world.modules["physics"]
        step = engine.build_step(world, donate=False)
        s = world.device_state()
        ms = s.modules["physics"]
        slot = pm.actors.slot_of(b)
        ms = ms.replace(vel=ms.vel.at[1, slot].set(-150.0))  # 2.5 m/frame
        s = s.replace(modules={**s.modules, "physics": ms})
        for _ in range(30):
            s = step(s, jnp.float32(1 / 60))
        return float(s.modules["physics"].pos[1, slot])

    y_ccd = run(True)
    y_free = run(False)
    assert y_free < -1.0, y_free   # tunneled through the slab
    assert y_ccd > -0.5, y_ccd     # stopped at/near the slab
