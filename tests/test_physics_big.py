"""Dynamic-pair (SAP) pipeline for large single worlds — BASELINE config 3."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lumixengine_tpu.ops import physics_big as PB
from lumixengine_tpu.ops import physics_ops as P


def make_scene(nb, seed=0):
    rng = np.random.default_rng(seed)
    shape = np.full(nb, P.SHAPE_BOX, np.int32)
    radius = np.full(nb, 0.5, np.float32)
    he = np.full((3, nb), 0.5, np.float32)
    dyn = np.ones(nb, bool)
    inv_mass = np.ones(nb, np.float32)
    iib = np.tile(np.full((1, nb), 6.0, np.float32), (3, 1))
    fric = np.full(nb, 0.6, np.float32)
    rest = np.zeros(nb, np.float32)
    step = PB.make_big_world_step(shape, radius, he, dyn, inv_mass, iib,
                                  fric, rest, neighbors=8)
    pos = jnp.asarray(np.stack([
        rng.uniform(-4, 4, nb), rng.uniform(1, 8, nb), rng.uniform(-4, 4, nb)
    ]).astype(np.float32))
    rot = jnp.zeros((4, nb)).at[3].set(1.0)
    return jax.jit(step), pos, rot, jnp.zeros((3, nb)), jnp.zeros((3, nb))


def test_sap_pairs_find_neighbors():
    # three boxes: two overlapping, one far away
    pos = jnp.asarray(np.array([[0.0, 0.6, 9.0], [0, 0, 0], [0, 0, 0]], np.float32))
    rot = jnp.zeros((4, 3)).at[3].set(1.0)
    he = jnp.full((3, 3), 0.5)
    shape = jnp.full(3, P.SHAPE_BOX, jnp.int32)
    radius = jnp.full(3, 0.5)
    mn, mx = P.world_aabb(pos, rot, shape, radius, he)
    pa, pb, ok = PB.sap_pairs(pos, mn, mx, neighbors=2)
    pairs = {tuple(sorted((int(a), int(b)))) for a, b, o in
             zip(np.asarray(pa), np.asarray(pb), np.asarray(ok)) if o}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_box_drop_settles_above_ground():
    step, pos, rot, vel, ang = make_scene(32)
    nact = None
    for _ in range(300):
        pos, rot, vel, ang, nact = step(pos, rot, vel, ang, jnp.float32(1 / 60))
    ys = np.asarray(pos[1])
    assert (ys > 0.3).all(), ys.min()          # nothing tunnels through
    assert ys.max() < 8.0                       # everything fell
    assert int(nact["active_contacts"]) > 0     # resting contacts persist
    assert int(nact["sap_window_miss"]) == 0    # window was wide enough


def test_dynamic_solver_matches_static_solver():
    """Same contact set solved by both PGS variants → same velocities."""
    from tests.test_physics import build_world

    engine, world, phys = build_world(actors=8)
    for i in range(5):
        e = world.create_entity(position=(i * 0.9, 0.6 + 0.5 * i, 0.0))
        world.create_component(e, "rigid_actor", motion="dynamic", shape="box",
                               half_extents=(0.5, 0.5, 0.5), friction=0.5)
    pm = world.modules["physics"]
    st = pm.statics()
    ms = world.device_state().modules["physics"]
    key = jax.random.PRNGKey(5)
    vel = jax.random.normal(key, ms.vel.shape) * 0.4
    ang = jax.random.normal(jax.random.fold_in(key, 1), ms.angvel.shape) * 0.2
    shape = jnp.asarray(st.shape)
    radius = jnp.asarray(st.radius)
    he = jnp.asarray(st.half_extents)
    dyn = jnp.asarray(st.dyn_mask)
    gc = P.ground_contacts(ms.pos, ms.rot, shape, radius, he, dyn)
    pc = P.pair_contacts(ms.pos, ms.rot, st.shape, radius, he, st.pair_a, st.pair_b)
    c = P.concat_contacts(gc, pc)
    iiw = P.inv_inertia_world_diag(ms.rot, jnp.asarray(st.inv_inertia_body))
    dt = 1 / 60
    v1, w1 = P.solve_contacts(ms.pos, ms.rot, vel, ang, c, st.inv_mass, iiw,
                              st.incidence_a, st.incidence_b, dt,
                              st.friction, st.restitution, iterations=2)
    has_b = jnp.asarray((c.body_b >= 0).astype(np.float32))
    v2, w2 = PB.solve_contacts_dynamic(
        ms.pos, vel, ang, jnp.asarray(st.inv_mass), iiw,
        c.point, c.normal, c.depth, c.active,
        jnp.asarray(np.maximum(c.body_a, 0)), jnp.asarray(np.maximum(c.body_b, 0)),
        has_b, jnp.asarray(st.friction), jnp.asarray(st.restitution), dt,
        iterations=2,
    )
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=5e-3)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=5e-3)


@pytest.mark.slow  # 22 s: banded-vs-static parity also gated by test_parity box drops
def test_banded_step_matches_dynamic_step():
    """The gather-free banded sweep-order pipeline must reproduce the
    segment_sum dynamic pipeline (same window K, full budget): identical
    candidate pairs, same math — only accumulation order differs."""
    from lumixengine_tpu.ops import physics_banded as PBD
    from lumixengine_tpu.ops import physics_big as PB
    from lumixengine_tpu.ops import physics_ops as P

    nb = 64
    rng = np.random.default_rng(3)
    shape = np.full(nb, P.SHAPE_BOX, np.int32)
    radius = np.full(nb, 0.5, np.float32)
    he = np.full((3, nb), 0.5, np.float32)
    dyn = np.ones(nb, bool)
    inv_mass = np.ones(nb, np.float32)
    iib = np.tile(np.full((1, nb), 1.0 / (1.0 / 12 * 2.0), np.float32), (3, 1))
    fric = np.full(nb, 0.6, np.float32)
    rest = np.zeros(nb, np.float32)
    args = (shape, radius, he, dyn, inv_mass, iib, fric, rest)
    import jax

    K = 16
    step_dyn = jax.jit(PB.make_big_world_step(*args, neighbors=K,
                                              pair_budget=nb * K))  # full list
    step_band = jax.jit(PBD.make_banded_world_step(*args, neighbors=K))

    side = 4
    grid = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"),
                    -1).reshape(-1, 3)[:nb]
    pos0 = jnp.asarray((grid * 1.08 + rng.uniform(0, 0.04, (nb, 3))
                        + [0.0, 1.0, 0.0]).T.astype(np.float32))
    rot0 = jnp.zeros((4, nb)).at[3].set(1.0)
    v0 = jnp.zeros((3, nb))
    w0 = jnp.zeros((3, nb))

    pa, ra, va, wa = pos0, rot0, v0, w0
    pb_, rb, vb, wb = pos0, rot0, v0, w0
    for i in range(20):
        pa, ra, va, wa, ca = step_dyn(pa, ra, va, wa, jnp.float32(1 / 60))
        pb_, rb, vb, wb, cb = step_band(pb_, rb, vb, wb, jnp.float32(1 / 60))
    # same contact census and close trajectories (fp reassociation only)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb_), atol=2e-2)
    assert abs(int(ca["active_contacts"]) - int(cb["active_contacts"])) <= 8
    assert not np.any(np.isnan(np.asarray(pb_)))
    # long run: banded pile settles above ground (same simmer profile as the
    # dynamic pipeline at this config — median velocity near zero, no body
    # below resting depth, no NaN)
    for i in range(380):
        pb_, rb, vb, wb, cb = step_band(pb_, rb, vb, wb, jnp.float32(1 / 60))
    y = np.asarray(pb_)[1]
    assert y.min() > 0.42 and not np.any(np.isnan(y))
    speeds = np.linalg.norm(np.asarray(vb), axis=0)
    # Jacobi piles simmer at this config (the dynamic pipeline shows the same
    # profile — see the head-to-head above); gate on bounded motion, not rest
    assert float(np.median(speeds)) < 0.5


@pytest.mark.slow
def test_engine_banded_mode_matches_sap_mode():
    """The engine's banded rank-space solve (default at SAP scale) matches
    the segment_sum SAP path on the same scene."""
    import jax.numpy as jnp
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem

    def run(broadphase):
        engine = Engine()
        engine.module_capacities = {"actors": 32}
        phys = PhysicsSystem(engine)
        engine.add_system(phys)
        world = engine.create_world(capacity=64)
        rng = np.random.default_rng(9)
        for i in range(24):
            p = rng.uniform(-3, 3, 2)
            e = world.create_entity(position=(float(p[0]), 1.0 + 0.6 * i,
                                              float(p[1])))
            world.create_component(e, "rigid_actor", motion="dynamic",
                                   shape=["box", "sphere", "capsule"][i % 3],
                                   half_extents=(0.4, 0.4, 0.4), radius=0.35,
                                   mass=1.0)
        pm = world.modules["physics"]
        pm.broadphase = broadphase
        pm.sap_neighbors = 23   # full window at 24 actors: same candidates
        pm.sap_sweeps = 1       # classic sweep: candidate set identical to
        pm.warm_starting = False  # sap mode cold-starts; compare like-for-like
        pm.invalidate_statics()
        step = engine.build_step(world, donate=False)
        s = world.device_state()
        for _ in range(90):
            s = step(s, jnp.float32(1 / 60))
        return np.asarray(s.modules["physics"].pos)

    pos_sap = run("sap")
    pos_band = run("banded")
    assert not np.any(np.isnan(pos_band))
    np.testing.assert_allclose(pos_band, pos_sap, atol=5e-2)


@pytest.mark.slow
def test_engine_banded_with_sdf_collider():
    """SDF mesh colliders work under the banded large-world mode (body-major
    candidate grids): spheres dropped on a slab mesh rest on it."""
    import jax.numpy as jnp
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem

    sv = np.array([[sx, sy, sz] for sx in (-4, 4) for sy in (0, 1)
                   for sz in (-4, 4)], np.float32)
    st_ = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    engine = Engine()
    engine.module_capacities = {"actors": 16}
    phys = PhysicsSystem(engine)
    phys.ground_plane = False
    engine.add_system(phys)
    world = engine.create_world(capacity=32)
    mc = world.create_entity()
    world.create_component(mc, "mesh_collider", vertices=sv, triangles=st_,
                           resolution=24)
    ents = []
    for i in range(6):
        e = world.create_entity(position=(-2.0 + i * 0.8, 2.5 + 0.2 * i, 0.0))
        world.create_component(e, "rigid_actor", motion="dynamic",
                               shape="sphere", radius=0.3, mass=1.0)
        ents.append(e)
    pm = world.modules["physics"]
    pm.broadphase = "banded"
    pm.invalidate_statics()
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    for _ in range(240):
        s = step(s, jnp.float32(1 / 60))
    ms = s.modules["physics"]
    ys = np.asarray(ms.pos)[1][[pm.actors.slot_of(e) for e in ents]]
    # resting on the slab top (y=1) + radius, SDF-cell tolerance
    assert (ys > 1.0).all() and (ys < 1.6).all(), ys


def _dense_grid_factory_args(n, spacing=0.98):
    """n³ 1-m boxes at `spacing` (< 1 ⇒ overlapping AABBs: every x-slab is
    mutually overlapping — the geometry that blows a single-axis window)."""
    from lumixengine_tpu.ops import physics_ops as P

    nb = n * n * n
    shape = np.full(nb, P.SHAPE_BOX, np.int32)
    radius = np.full(nb, 0.87, np.float32)
    he = np.tile(np.array([[0.5], [0.5], [0.5]], np.float32), (1, nb))
    dyn = np.ones(nb, bool)
    inv_mass = np.ones(nb, np.float32)
    iib = np.tile(np.array([[6.0], [6.0], [6.0]], np.float32), (1, nb))
    fric = np.full(nb, 0.6, np.float32)
    rest = np.zeros(nb, np.float32)
    g = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                 0).reshape(3, -1)
    pos = (g * spacing + spacing / 2).astype(np.float32)
    pos[0] -= n * spacing / 2
    pos[2] -= n * spacing / 2
    return (shape, radius, he, dyn, inv_mass, iib, fric, rest), pos


def test_multi_sweep_covers_dense_pile():
    """The 4-offset column sweeps capture every overlapping pair in a dense
    3-D grid where the classic x-sweep provably cannot (sweep_orders
    coverage theorem); exact_window_miss is the ground-truth check."""
    import jax
    import jax.numpy as jnp
    from lumixengine_tpu.ops import physics_banded as PBD

    args, pos0 = _dense_grid_factory_args(5)
    nb = pos0.shape[-1]
    rot0 = np.tile(np.array([[0.0], [0.0], [0.0], [1.0]], np.float32),
                   (1, nb))
    z3 = jnp.zeros((3, nb))

    def first_miss(n_sweeps, K):
        step = jax.jit(PBD.make_banded_world_step(
            *args, neighbors=K, n_sweeps=n_sweeps, exact_miss=True))
        _, _, _, _, c = step(jnp.asarray(pos0), jnp.asarray(rot0), z3, z3,
                             jnp.float32(1 / 60))
        return int(c["sap_window_miss"])

    assert first_miss(1, 8) > 0        # classic sweep drops real contacts
    # offset columns: exact (K ≳ bodies-per-column-level × levels-in-reach;
    # a 2-cell column of 0.98-spaced boxes holds up to ~9 per level)
    assert first_miss(4, 16) == 0


@pytest.mark.slow  # 21 s: the zero-miss certificate is also asserted by the bench path
def test_multi_sweep_certificate_and_settle():
    """Multi-sweep factory pile drop: the cheap zero-miss certificate stays
    zero through churn (cross-checked by the exact diagnostic elsewhere),
    and the pile settles above ground without NaNs."""
    import jax
    import jax.numpy as jnp
    from lumixengine_tpu.ops import physics_banded as PBD

    args, pos0 = _dense_grid_factory_args(4, spacing=1.3)
    nb = pos0.shape[-1]
    pos0[1] += 0.5
    step = jax.jit(PBD.make_banded_world_step(
        *args, neighbors=24, n_sweeps=4))
    p = jnp.asarray(pos0)
    r = jnp.tile(jnp.array([[0.0], [0.0], [0.0], [1.0]]), (1, nb))
    v = jnp.zeros((3, nb))
    w = jnp.zeros((3, nb))
    total_miss = 0
    for _ in range(120):
        p, r, v, w, c = step(p, r, v, w, jnp.float32(1 / 60))
        total_miss += int(c["sap_window_miss"])
    assert total_miss == 0
    assert not bool(jnp.any(jnp.isnan(p)))
    ys = np.asarray(p)[1]
    assert (ys > 0.3).all(), ys.min()   # nothing fell through the ground


@pytest.mark.slow
def test_engine_multi_sweep_dense_stack():
    """Engine banded path with sap_sweeps=4 (the default): a dense 3x3x3
    box block keeps its contacts (certificate zero) and rests on ground."""
    import jax.numpy as jnp
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem

    engine = Engine()
    engine.module_capacities = {"actors": 32}
    phys = PhysicsSystem(engine)
    engine.add_system(phys)
    world = engine.create_world(capacity=64)
    for ix in range(3):
        for iy in range(3):
            for iz in range(3):
                e = world.create_entity(position=(ix * 1.0 - 1.5,
                                                  0.55 + iy * 1.02,
                                                  iz * 1.0 - 1.5))
                world.create_component(e, "rigid_actor", motion="dynamic",
                                       shape="box",
                                       half_extents=(0.5, 0.5, 0.5),
                                       mass=1.0)
    pm = world.modules["physics"]
    pm.broadphase = "banded"
    assert pm.sap_sweeps == 4   # the default is the guaranteed mode
    pm.sap_neighbors = 16
    pm.invalidate_statics()
    step = engine.build_step(world, donate=False)
    s = world.device_state()
    total_miss = 0
    for _ in range(150):
        s = step(s, jnp.float32(1 / 60))
        total_miss += int(s.modules["physics"].counters["sap_window_miss"])
    ms = s.modules["physics"]
    assert total_miss == 0
    pos = np.asarray(ms.pos)
    occ = pm.statics().occupied
    assert not np.any(np.isnan(pos[:, occ]))
    assert (pos[1][occ] > 0.35).all(), pos[1][occ].min()
