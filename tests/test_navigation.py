import numpy as np
import jax.numpy as jnp

from lumixengine_tpu.engine.engine import Engine
from lumixengine_tpu.navigation.module import NavZone, NavigationSystem


def test_astar_straight_and_around_wall():
    z = NavZone(origin=(0, 0), size=(16, 16), cell=1.0)
    p = z.find_path((1.5, 1.5), (10.5, 1.5))
    assert p is not None and len(p) == 2  # straight line prunes to endpoints
    # wall with a gap
    z.walkable[0:12, 6] = False
    p = z.find_path((1.5, 1.5), (10.5, 1.5))
    assert p is not None and len(p) > 2
    ys = [wp[1] for wp in p]
    assert max(ys) > 11.0  # detours above the wall
    # fully blocked
    z2 = NavZone(size=(8, 8))
    z2.walkable[:, 4] = False
    assert z2.find_path((1.0, 1.0), (6.0, 1.0)) is None


def test_zone_serialize_roundtrip():
    z = NavZone(origin=(-5, -5), size=(8, 8), cell=0.5)
    z.walkable[3, 4] = False
    z2 = NavZone.deserialize(z.serialize())
    assert z2.cell == z.cell and z2.w == z.w
    np.testing.assert_array_equal(z.walkable, z2.walkable)


def test_agents_walk_to_destination_in_fused_step():
    engine = Engine()
    engine.module_capacities = {"nav_agents": 8}
    engine.add_system(NavigationSystem(engine))
    world = engine.create_world(capacity=8)
    a = world.create_entity(position=(2.0, 0.0, 2.0))
    b = world.create_entity(position=(4.0, 0.0, 2.0))
    world.create_component(a, "nav_agent", speed=3.0)
    world.create_component(b, "nav_agent", speed=3.0)
    nav = world.modules["navigation"]
    nav.zone = NavZone(origin=(0, 0), size=(32, 32), cell=1.0)

    step = engine.build_step(world, donate=False)
    state = world.device_state()
    state = nav.set_destination(state, a, (20.0, 20.0))
    assert int(state.modules["navigation"].wp_count[nav.agents.slot_of(a)]) >= 2

    for _ in range(320):
        state = step(state, jnp.float32(1 / 30))
    ns = state.modules["navigation"]
    pa = np.asarray(ns.agent_pos[:, nav.agents.slot_of(a)])
    assert abs(pa[0] - 20.0) < 1.0 and abs(pa[2] - 20.0) < 1.0
    # entity transform followed the agent
    np.testing.assert_allclose(
        np.asarray(state.world.pos[:, world.slot(a)]), pa, atol=1e-4
    )
    # idle agent b only got pushed slightly by separation, it didn't navigate
    pb = np.asarray(ns.agent_pos[:, nav.agents.slot_of(b)])
    assert np.linalg.norm(pb - np.array([4.0, 0.0, 2.0])) < 2.0


def test_agents_separate():
    engine = Engine()
    engine.module_capacities = {"nav_agents": 4}
    engine.add_system(NavigationSystem(engine))
    world = engine.create_world(capacity=4)
    a = world.create_entity(position=(5.0, 0.0, 5.0))
    b = world.create_entity(position=(5.2, 0.0, 5.0))
    world.create_component(a, "nav_agent", radius=0.5)
    world.create_component(b, "nav_agent", radius=0.5)
    nav = world.modules["navigation"]
    step = engine.build_step(world, donate=False)
    state = world.device_state()
    for _ in range(60):
        state = step(state, jnp.float32(1 / 30))
    ns = state.modules["navigation"]
    pa = np.asarray(ns.agent_pos[:, nav.agents.slot_of(a)])
    pb = np.asarray(ns.agent_pos[:, nav.agents.slot_of(b)])
    assert np.linalg.norm(pa - pb) > 0.8  # pushed apart toward 2*radius


def test_windowed_separation_matches_dense():
    """The x-sorted window separation (large-crowd path) must match the dense
    O(A²) push when the window covers every interacting pair."""
    import jax.numpy as jnp
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.navigation.module import NavigationSystem

    def build(threshold):
        engine = Engine()
        engine.module_capacities = {"nav_agents": 32}
        engine.add_system(NavigationSystem(engine))
        world = engine.create_world(capacity=64)
        nm = world.modules["navigation"]
        nm.separation_window_threshold = threshold
        nm.separation_window = 31   # full coverage at 32 agents
        rng = np.random.default_rng(11)
        for i in range(24):
            p = rng.uniform(-3, 3, 2)
            e = world.create_entity(position=(p[0], 0.0, p[1]))
            world.create_component(e, "nav_agent", radius=0.5)
        step = engine.build_step(world, donate=False)
        s = world.device_state()
        for _ in range(30):
            s = step(s, jnp.float32(1 / 30))
        return np.asarray(s.modules["navigation"].agent_pos)

    dense = build(threshold=1000)   # dense path
    windowed = build(threshold=1)   # force the windowed path
    np.testing.assert_allclose(windowed, dense, atol=1e-4)
