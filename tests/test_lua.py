"""Lua content execution: the reference's demo scripts RUN (VERDICT r2 #1).

≙ reference src/lua/lua_script_system.cpp pcall semantics + the shipped
gameplay in demo/scripts/*.lua and demo/maps/tetris/tetris.lua. These tests
drive the real reference sources through the clean-room interpreter
(script/lua) and bridge (script/lua_bridge)."""
import os

import numpy as np
import pytest

from lumixengine_tpu.script.lua import Interpreter, LuaTable

REF = "/root/reference/demo"


def ref_loader(path):
    p = os.path.join(REF, path + ".lua")
    if os.path.isfile(p):
        with open(p) as f:
            return f.read()
    return None


# -- interpreter unit tests (language semantics) ---------------------------------


def run(src, env=None, loader=None):
    it = Interpreter(loader=loader)
    out = []
    it.print_fn = out.append
    it.run(src, "test", env=env)
    return out, it


def test_core_language():
    out, _ = run("""
local t = {}
for i = 1, 5 do table.insert(t, i * 2) end
print(#t, t[1], t[5])
local s = 0
for _, v in ipairs(t) do s = s + v end
print(s)
local function fact(n) if n <= 1 then return 1 end return n * fact(n - 1) end
print(fact(6))
print("Score: " .. tostring(100))
local q = {x = 1, ["y"] = 2}
print(q.x + q.y)
local i = 0
while i < 3 do i = i + 1 end
repeat i = i - 1 until i == 0
print(i)
""")
    assert out == ["5\t2\t10", "30", "720", "Score: 100", "3", "0"]


def test_closures_varargs_multret():
    out, _ = run("""
local function counter()
  local n = 0
  return function() n = n + 1 return n end
end
local c = counter()
c() c()
print(c())
local function mr() return 1, 2, 3 end
local a, b, c2 = mr()
print(a + b + c2)
local function va(...) return select("#", ...) end
print(va(10, 20, 30))
local ok, err = pcall(function() error("boom") end)
print(ok, err)
""")
    assert out == ["3", "6", "3", "false\tboom"]


def test_luau_extensions():
    out, _ = run("""
local function f(x: number): number
  local acc = 0
  acc += x
  acc *= 2
  return acc
end
print(f(21))
local s : string = "typed"
print(s)
""")
    assert out == ["42", "typed"]


def test_reference_math_module():
    out, _ = run("""
local m = require "scripts/math"
print(m.dot({1,2,3},{4,5,6}))
local v = m.transformVec3({0, 0.7071068, 0, 0.7071068}, {1, 0, 0})
print(string.format("%.2f %.2f %.2f", v[1], v[2], v[3]))
""", loader=ref_loader)
    assert out[0] == "32"
    assert out[1] == "-0.00 0.00 -1.00"


def test_coroutines_thread_handoff():
    out, _ = run("""
local co = coroutine.create(function(a)
  local x = coroutine.yield(a + 1)
  return x * 2
end)
print(select(2, coroutine.resume(co, 10)))
print(select(2, coroutine.resume(co, 5)))
print(coroutine.status(co))
""")
    assert out == ["11", "10", "dead"]


def test_reference_coroutine_library():
    """The reference's scripts/coroutine.lua: run/parallel/wait tick across
    frames (used by the demo map's button press sequences)."""
    it = Interpreter(loader=ref_loader)
    env = it.new_env()
    it.run("""
local co = require "scripts/coroutine"
_G["global"] = { running_coroutines = {} }
log = {}
co.run(function()
  table.insert(log, "begin")
  co.parallel(
    function() co.wait(0.25) table.insert(log, "a") end,
    function() co.wait(0.1) table.insert(log, "b") end
  )
  table.insert(log, "end")
  return false
end)
function tick(td) co.tick(td) end
""", "script", env=env)
    for _ in range(5):
        it.call_value(env.get("tick"), [0.1])
    log = env.get("log")
    assert [log.get(i + 1) for i in range(4)] == ["begin", "b", "a", "end"]


# -- engine integration: the reference's shipped gameplay -----------------------------


def _fresh_runner_for(map_rel):
    from lumixengine_tpu import app as app_mod
    from lumixengine_tpu.importers.instantiate import load_world

    scene = load_world(f"{REF}/maps/{map_rel}")
    runner = app_mod.Runner([], engine=scene.engine)
    runner.use_world(scene.world)
    return runner, scene


def test_flying_cam_moves_camera():
    from lumixengine_tpu import app as app_mod
    from lumixengine_tpu.engine.input import DEVICE_KEYBOARD, DEVICE_MOUSE

    engine = app_mod.create_full_engine(model_instances=64)
    runner = app_mod.Runner([], engine=engine)
    world = engine.create_world(capacity=64)
    cam = world.create_entity(position=(0.0, 3.0, 8.0), name="camera")
    world.create_component(cam, "camera")
    sm = world.modules["script"]
    sm.lua_search_dirs = [REF]
    env = sm.attach_lua_script(cam, path="scripts/flying_cam.lua")
    assert env.error is None
    runner.use_world(world)
    runner.start()

    engine.input.inject_button(DEVICE_MOUSE, 1, True)      # RMB: enable look
    engine.input.inject_axis(DEVICE_MOUSE, 2.0, 0.0)       # mouse yaw
    engine.input.inject_button(DEVICE_KEYBOARD, 87, True)  # W: forward
    for _ in range(30):
        runner.tick()
    pos = np.asarray(runner.state.world.pos[:, world.slot(cam)])
    rot = np.asarray(runner.state.world.rot[:, world.slot(cam)])
    assert abs(pos[2] - 8.0) > 0.1, "camera did not fly forward"
    assert abs(rot[1]) > 1e-4, "camera did not yaw from mouse input"


def test_tetris_plays():
    """tetris.unv ticks AND plays: pieces spawn from the pool, gravity-drop on
    the 0.8 s timer, move on A, hard-drop + lock on SPACE, new piece spawns
    (≙ demo/maps/tetris/tetris.lua driven by lua_script_system.cpp)."""
    from lumixengine_tpu.engine.input import DEVICE_KEYBOARD

    runner, scene = _fresh_runner_for("tetris/tetris.unv")
    world, engine = scene.world, scene.engine
    sm = world.modules["script"]
    env0 = list(sm.lua_envs.values())[0][0]
    assert env0.error is None, env0.error
    sm.lua_runtime().interp.rng.seed(7)   # deterministic piece sequence
    runner.start()
    rt = sm._lua_rt

    def claimed():
        free = {e for pool in rt.spawn_pools.values() for e in pool}
        return sorted(e for e in rt.pooled_entities if e not in free)

    piece = claimed()
    assert len(piece) == 4, "start() did not spawn a 4-cube piece"
    runner.tick(1 / 30)
    ys0 = [float(runner.state.world.pos[1, world.slot(e)]) for e in piece]
    assert all(y > 30.0 for y in ys0), f"piece not near the top: {ys0}"

    for _ in range(27):   # cross the DROP_INTERVAL
        runner.tick(1 / 30)
    ys1 = [float(runner.state.world.pos[1, world.slot(e)]) for e in piece]
    assert all(b < a - 2.0 for a, b in zip(ys0, ys1)), "piece did not drop"

    engine.input.inject_button(DEVICE_KEYBOARD, 65, True)   # A: left
    runner.tick(1 / 30)
    engine.input.inject_button(DEVICE_KEYBOARD, 65, False)
    engine.input.inject_button(DEVICE_KEYBOARD, 32, True)   # SPACE: hard drop
    runner.tick(1 / 30)
    engine.input.inject_button(DEVICE_KEYBOARD, 32, False)
    runner.tick(1 / 30)
    assert len(claimed()) == 8, "hard drop did not lock + spawn the next piece"
    locked_ys = sorted(float(runner.state.world.pos[1, world.slot(e)])
                       for e in piece)
    assert locked_ys[0] < 7.0, f"locked cubes not at the bottom: {locked_ys}"


def test_inherit_and_cross_env(tmp_path):
    """`inherit "base"` runs the base chunk in the SAME env (≙ Lumix inherit;
    how physics_test_button.lua provides buttonPressed to button.lua)."""
    from lumixengine_tpu import app as app_mod

    engine = app_mod.create_full_engine(model_instances=8)
    world = engine.create_world(capacity=16)
    e = world.create_entity(name="btn")
    sm = world.modules["script"]
    (tmp_path / "base.lua").write_text(
        "base_called = false\nfunction callBase() base_called = true end\n")
    sm.lua_search_dirs = [str(tmp_path)]
    env = sm.attach_lua_script(
        e, source='inherit "base"\ncallBase()\n')
    assert env.error is None
    assert env.env.get("base_called") is True


def test_lua_property_application():
    """Stored .unv script properties overwrite chunk defaults AFTER the chunk
    runs (≙ applyProperty after load: `x = x or Entity.NULL` keeps the value)."""
    from lumixengine_tpu import app as app_mod

    engine = app_mod.create_full_engine(model_instances=8)
    world = engine.create_world(capacity=16)
    target = world.create_entity(position=(5.0, 0.0, 0.0), name="target")
    holder = world.create_entity(name="holder")
    sm = world.modules["script"]
    env = sm.attach_lua_script(
        holder,
        source="point0 = point0 or Lumix.Entity.NULL\n"
               "function check() return point0.position[1] end\n",
        properties={"point0": sm.lua_entity(target)})
    assert env.error is None
    assert env.call("check") == 5.0


@pytest.mark.slow
def test_demo_map_scripts_run_clean():
    """demo.unv: all 11 shipped scripts (player, buttons, coroutine lib, AI,
    color tickers) execute with zero runtime errors; stored entity properties
    resolve via bit-exact XXH3 name hashes; W + mouse input reaches player.lua
    (animator speed input + yaw rotation)."""
    from lumixengine_tpu.engine.input import DEVICE_KEYBOARD, DEVICE_MOUSE

    runner, scene = _fresh_runner_for("demo/demo.unv")
    world, engine = scene.world, scene.engine
    sm = world.modules["script"]
    assert all(v.error is None
               for envs in sm.lua_envs.values() for v in envs)
    runner.start()
    for _ in range(3):
        runner.tick(1 / 30)
    errs = [(v.path, v.error) for envs in sm.lua_envs.values()
            for v in envs if v.error]
    assert errs == [], errs

    # player.lua: W sets the 'speed_y' animator input to 3, mouse yaws `this`
    player = world.find_by_name("player")
    if player < 0:  # name may differ: entity 1 holds player.lua per the map
        player = next(e for e, envs in sm.lua_envs.items()
                      if any("player" in v.path for v in envs))
    am = world.modules["animation"]
    aslot = am.animators.slot_of(player)
    assert aslot >= 0
    ctrl = am.system.controllers[int(am.animators.data["controller"][aslot])]
    idx = ctrl.input_index("speed_y")
    engine.input.inject_button(DEVICE_KEYBOARD, 87, True)   # W
    engine.input.inject_axis(DEVICE_MOUSE, 5.0, 0.0)
    runner.tick(1 / 30)
    runner.tick(1 / 30)
    ms = runner.state.modules["animation"]
    assert float(ms.ctrl_inputs[idx, aslot]) == 3.0
    rot = np.asarray(runner.state.world.rot[:, world.slot(player)])
    assert abs(rot[1]) > 1e-5, "player did not yaw from mouse input"
    errs = [(v.path, v.error) for envs in sm.lua_envs.values()
            for v in envs if v.error]
    assert errs == [], errs
