"""Restricted-Lua device fast path (script/lua_fastpath.py ≙ reference
lua_script_system.cpp:1661-1684 update pcalls, moved on-device for the
numeric-kinematics subset): compiled update() bodies run inside the fused
step, match the host interpreter's trajectories, fall back per-script on
unsupported constructs, and write their state back for saves."""
import numpy as np
import pytest

from lumixengine_tpu import app as app_mod

MOVE_LUA = """
local pos = {}
local t = 0

function start()
    pos = this.position
end

function update(time_delta)
    t = t + time_delta
    this.position = {
        pos[1] + math.cos(t) * 3,
        pos[2],
        pos[3] + math.sin(t) * 3
    }
end
"""

BRANCH_LUA = """
local t = 0
local dir = 1

function update(dt)
    t = t + dt * dir
    if t > 0.5 then
        dir = -1
    elseif t < -0.5 then
        dir = 1
    end
    this.position = {t, 2.0, 0.0}
end
"""

HOST_ONLY_LUA = """
local t = 0
function update(dt)
    t = t + dt
    this.name = "renamed"   -- engine API: not in the fast subset
end
"""


def make_runner(source, n_entities=1):
    engine = app_mod.create_full_engine(model_instances=max(n_entities, 8))
    world = engine.create_world(capacity=n_entities + 8)
    sm = world.modules["script"]
    ents = []
    for i in range(n_entities):
        e = world.create_entity(position=(float(i), 1.0, 0.0),
                                name=f"mover{i}")
        env = sm.attach_lua_script(e, source=source)
        assert env.error is None
        ents.append(e)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    return runner, world, sm, ents


def test_move_lua_compiles_and_matches_interpreter():
    runner, world, sm, ents = make_runner(MOVE_LUA, n_entities=3)
    assert len(sm._fast_groups) == 1
    g = sm._fast_groups[0]
    assert len(g.entities) == 3          # one group, vectorized instances
    runner.run(60)
    t = 60 * (1 / 60)
    sl = [world.slot(e) for e in ents]
    pos = np.asarray(runner.state.world.pos)[:, sl]
    for i in range(3):
        np.testing.assert_allclose(
            pos[:, i], [float(i) + np.cos(t) * 3, 1.0, np.sin(t) * 3],
            atol=2e-4)


def test_fastpath_matches_host_interpreter_bitwise_semantics():
    """The same script driven by the host tree-walker (forced by giving the
    entity a parent — fast path requires roots) lands within f32 tolerance
    of the device-compiled run."""
    # device run
    r1, w1, sm1, (e1,) = make_runner(MOVE_LUA)
    assert sm1._fast_groups
    r1.run(30)
    p_dev = np.asarray(r1.state.world.pos)[:, w1.slot(e1)]

    # host run: parented entity → Unsupported → interpreter path
    engine = app_mod.create_full_engine(model_instances=8)
    world = engine.create_world(capacity=8)
    root = world.create_entity(position=(0.0, 0.0, 0.0), name="root")
    e = world.create_entity(position=(0.0, 1.0, 0.0), name="mover")
    world.set_parent(e, root)
    sm = world.modules["script"]
    env = sm.attach_lua_script(e, source=MOVE_LUA)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    assert not sm._fast_groups
    runner.run(30)
    p_host = np.asarray(runner.state.world.pos)[:, world.slot(e)]
    np.testing.assert_allclose(p_dev, p_host, atol=1e-3)


def test_branchy_script_compiles_with_where_merges():
    runner, world, sm, (e,) = make_runner(BRANCH_LUA)
    assert sm._fast_groups, "if/elseif/else should compile"
    runner.run(120)
    x = float(np.asarray(runner.state.world.pos)[0, world.slot(e)])
    assert -0.55 <= x <= 0.55            # ping-pongs inside the band


def test_unsupported_script_falls_back_to_host():
    runner, world, sm, (e,) = make_runner(HOST_ONLY_LUA)
    assert not sm._fast_groups
    runner.run(2)
    assert world.names[e] == "renamed"   # the host path really ran


def test_state_writes_back_to_lua_scope():
    runner, world, sm, (e,) = make_runner(MOVE_LUA)
    runner.run(45)
    world.load_state(runner.state)
    env = sm.lua_envs[e][0]
    fn = env.env.get("update")
    t_scope = fn.scope.lookup("t").vars["t"]
    np.testing.assert_allclose(t_scope, 45 / 60, atol=1e-5)


def test_fastpath_vmaps_across_worlds():
    """The compiled phase composes with the world batch (the bench path)."""
    import jax
    import jax.numpy as jnp
    from lumixengine_tpu.parallel.mesh import replicate_state

    runner, world, sm, ents = make_runner(MOVE_LUA, n_entities=2)
    raw = runner.engine.build_step(world, extra=None, jit=False, donate=False)
    state_b = replicate_state(runner.world.device_state(), 4)
    stepb = jax.jit(jax.vmap(lambda s: raw(s, jnp.float32(1 / 60))))
    for _ in range(10):
        state_b = stepb(state_b)
    t = 10 / 60
    sl = [world.slot(e) for e in ents]
    pos = np.asarray(state_b.world.pos)[:, :, sl]
    for wi in range(4):
        np.testing.assert_allclose(
            pos[wi, 0, 0], np.cos(t) * 3, atol=2e-4)
