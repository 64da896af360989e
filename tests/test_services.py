"""Core/engine service tests: filesystem, resources, input, config, log,
profiler, hashing, CoreModule splines/signals, scripting."""
import os
import time

import numpy as np
import jax.numpy as jnp
import pytest

from lumixengine_tpu.core import config as cfg
from lumixengine_tpu.core import log
from lumixengine_tpu.core import profiler
from lumixengine_tpu.core.hash import bone_name_hash, file_path_hash, stable_hash32, stable_hash64


def test_stable_hashes():
    assert stable_hash64("hello") == stable_hash64(b"hello")
    assert stable_hash64("hello") != stable_hash64("hellp")
    assert 0 <= stable_hash32("x") < 2**32
    # BoneNameHash = StableHash = raw XXH3 over the name (hash.h:76,
    # hash.cpp:13-15) — case-SENSITIVE, bit-exact with the reference so
    # serialized .unv bone references resolve against FBX bone names
    assert bone_name_hash("Spine") != bone_name_hash("spine")
    assert bone_name_hash("Spine") == stable_hash64("Spine")
    # FilePathHash normalizes slashes + case before hashing (path.cpp)
    assert file_path_hash("a\\b/C.tex") == file_path_hash("a/b/c.tex")


def test_filesystem_memory_and_async(tmp_path):
    from lumixengine_tpu.engine.file_system import FileSystem

    fs = FileSystem(str(tmp_path))
    fs.add_memory_file("mem/a.txt", b"in-memory")
    assert fs.read("mem/a.txt") == b"in-memory"
    fs.write("on/disk.bin", b"\x01\x02")
    assert fs.read("on/disk.bin") == b"\x01\x02"
    fs.mount("/assets", str(tmp_path / "on"))
    assert fs.read("/assets/disk.bin") == b"\x01\x02"

    got = []
    fs.read_async("mem/a.txt", lambda data, err: got.append((data, err)))
    fs.read_async("missing.txt", lambda data, err: got.append((data, err)))
    t0 = time.time()
    while len(got) < 2 and time.time() - t0 < 5:
        fs.process_callbacks()
        time.sleep(0.01)
    assert (b"in-memory", None) in got
    assert any(d is None and e for d, e in got)


def test_resource_manager_states():
    from lumixengine_tpu.engine.file_system import FileSystem
    from lumixengine_tpu.engine.resource import READY, FAILURE, ResourceManagerHub

    fs = FileSystem(".")
    fs.add_memory_file("tex/a.res", b"DATA")
    hub = ResourceManagerHub(fs)
    res = hub.load("texture", "tex/a.res")
    bad = hub.load("texture", "tex/missing.res")
    loaded = []
    res.on_loaded(lambda r: loaded.append(r.state))
    t0 = time.time()
    while (res.state == 0 or bad.state == 0) and time.time() - t0 < 5:
        fs.process_callbacks()
        time.sleep(0.01)
    assert res.state == READY and res.data == b"DATA"
    assert bad.state == FAILURE and bad.error
    assert loaded == [READY]
    # refcounting
    assert res.refcount == 1
    hub.managers["texture"].unload(res)
    assert "tex/a.res" not in hub.managers["texture"].resources


def test_asset_cache_hits():
    from lumixengine_tpu.engine.resource import AssetCache

    cache = AssetCache()
    calls = []
    out1 = cache.get_or_bake(b"src", lambda: calls.append(1) or "baked")
    out2 = cache.get_or_bake(b"src", lambda: calls.append(1) or "baked2")
    assert out1 == out2 == "baked"
    assert len(calls) == 1 and cache.hits == 1


def test_input_system_events():
    from lumixengine_tpu.engine.input import DEVICE_KEYBOARD, DEVICE_MOUSE, InputSystem

    inp = InputSystem()
    inp.inject_button(DEVICE_KEYBOARD, 65, True)
    inp.inject_axis(DEVICE_MOUSE, 10.0, 20.0)
    assert not inp.is_down(65)  # not drained yet
    inp.update()
    assert inp.is_down(65)
    assert inp.mouse_pos == (10.0, 20.0)
    assert len(inp.events) == 2
    inp.update()
    assert len(inp.events) == 0 and inp.is_down(65)  # state persists


def test_settings_and_cli(tmp_path):
    s = cfg.Settings()
    s.register("vsync", True, "renderer")
    s.register("lod_bias", 1.0, "renderer")
    s.register("world", "", "app")
    cli = cfg.CommandLineParser(cmdline="-world demo.unv -lod_bias 2.5 -profile_start")
    assert cli.has("profile_start")
    assert cli.value("world") == "demo.unv"
    cli.apply_to_settings(s)
    assert s.get("lod_bias") == 2.5
    ini = str(tmp_path / "settings.ini")
    s.save_ini(ini)
    s2 = cfg.Settings()
    s2.register("lod_bias", 1.0, "renderer")
    s2.load_ini(ini)
    assert s2.get("lod_bias") == 2.5


def test_project_roundtrip():
    p = cfg.Project(startup_world="maps/demo.world", system_versions={"physics": 2})
    p2 = cfg.Project.loads(p.dumps())
    assert p2.startup_world == "maps/demo.world"
    assert p2.system_versions == {"physics": 2}


def test_log_fanout_and_ring():
    got = []
    cb = lambda lvl, sys_, msg: got.append((lvl, sys_, msg))  # noqa: E731
    log.register_callback(cb)
    log.log_info("test", "hello")
    log.log_error("test", "boom")
    log.unregister_callback(cb)
    log.log_info("test", "after")
    assert (log.LOG_INFO, "test", "hello") in got
    assert (log.LOG_ERROR, "test", "boom") in got
    assert all(m != "after" for _, _, m in got)
    assert any(m == "after" for _, _, _, m in log.recent)


def test_profiler_blocks_counters_export(tmp_path):
    profiler.clear()
    with profiler.block("outer"):
        with profiler.block("inner"):
            time.sleep(0.01)
    profiler.push_counter("fps", 60.0)
    profiler.frame()
    names = [b[0] for b in profiler.blocks()]
    assert "outer" in names and "inner" in names
    inner = next(b for b in profiler.blocks() if b[0] == "inner")
    assert inner[2] - inner[1] >= 0.009
    out = str(tmp_path / "trace.json")
    profiler.export_chrome_trace(out)
    import json
    events = json.load(open(out))["traceEvents"]
    assert any(e.get("name") == "fps" for e in events)


def test_core_module_spline_sampling():
    from lumixengine_tpu.engine.core_module import CoreModule, CoreSystem, sample_spline
    from lumixengine_tpu.engine.engine import Engine

    engine = Engine()
    engine.add_system(CoreSystem(engine))
    world = engine.create_world(capacity=8)
    e = world.create_entity()
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 2, 0]], np.float32)
    world.create_component(e, "spline", points=pts)
    cm = world.modules["core"]
    bank = cm.bank
    idx = jnp.full(3, cm.spline_index(e), jnp.int32)
    t = jnp.array([0.0, 1.0 / 3.0, 1.0])  # arc length: 1 + 2 = 3
    out = np.asarray(sample_spline(bank, idx, t))
    np.testing.assert_allclose(out[:, 0], [0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(out[:, 1], [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(out[:, 2], [1, 2, 0], atol=1e-5)


def test_core_module_signal_dispatch():
    from lumixengine_tpu.engine import reflection
    from lumixengine_tpu.engine.core_module import CoreSystem
    from lumixengine_tpu.engine.engine import Engine

    reflection.register_builtin_components()
    fired = []
    reflection.registry.module("renderer").cmp("point_light").func(
        "turn_off", lambda module, entity: fired.append(entity)
    ).event("on_trigger")

    engine = Engine()
    engine.add_system(CoreSystem(engine))
    world = engine.create_world(capacity=8)
    sig = world.create_entity()
    world.create_component(sig, "signal",
                           event_component="point_light", event="on_trigger",
                           function_component="point_light", function="turn_off",
                           target_entity=5)
    cm = world.modules["core"]
    n = cm.dispatch_signals([{"component": "point_light", "event": "on_trigger", "entity": sig}])
    assert n == 1 and fired == [5]


def test_script_module_runs_callbacks():
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.script.module import ScriptSystem

    engine = Engine()
    engine.add_system(ScriptSystem(engine))
    world = engine.create_world(capacity=8)
    e = world.create_entity(position=(1.0, 0.0, 0.0), name="mover")
    src = """
state = {"count": 0}
def start():
    state["started"] = True
def update(dt):
    state["count"] += 1
    p = this.position
    this.position = [p[0] + dt, p[1], p[2]]
"""
    world.create_component(e, "inline_script", source=src, name="mover")
    sm = world.modules["script"]
    engine.start_game(world)
    for _ in range(3):
        sm.update_host(0.5)
    env = sm.scripts[e][0]
    assert env.globals["state"]["started"]
    assert env.globals["state"]["count"] == 3
    np.testing.assert_allclose(world.get_global_transform(e)[0], [2.5, 0, 0], atol=1e-5)
    assert env.error is None


def test_script_errors_are_contained():
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.script.module import ScriptSystem

    engine = Engine()
    engine.add_system(ScriptSystem(engine))
    world = engine.create_world(capacity=8)
    e = world.create_entity()
    world.create_component(e, "inline_script", source="def update(dt):\n    raise RuntimeError('x')\n")
    sm = world.modules["script"]
    sm.update_host(0.1)  # must not raise
    assert sm.scripts[e][0].error is not None


def test_reflection_property_access():
    from lumixengine_tpu.engine import reflection
    from lumixengine_tpu.models import demo_scenes

    reflection.register_builtin_components()
    engine, world, renderer = demo_scenes.headless_demo_world(num_entities=64)
    lights = [e for e in range(world.capacity)
              if world.is_alive(e) and world.has_component(e, "point_light")]
    e = lights[0]
    reflection.registry.set_property(world, e, "point_light", "intensity", 5.5)
    assert reflection.registry.get_property(world, e, "point_light", "intensity") == np.float32(5.5)
    # clamping via attributes
    reflection.registry.set_property(world, e, "point_light", "intensity", -3.0)
    assert reflection.registry.get_property(world, e, "point_light", "intensity") == 0.0


# ---------------------------------------------------------------------------
# OS layer (≙ core/os.h: window/event surface, gamepads, clipboard)

def test_os_layer_events_reach_input_system():
    from lumixengine_tpu.core.os import Event, EventType, OSLayer
    from lumixengine_tpu.engine.input import DEVICE_KEYBOARD, InputSystem

    osl = OSLayer()
    isys = InputSystem()
    osl.create_window("t", (800, 600))
    assert osl.window_state().rect[2] == 800
    osl.backend.push(Event(EventType.KEY, down=True, keycode=65))
    osl.backend.push(Event(EventType.TEXT_INPUT, text="a"))
    osl.backend.push(Event(EventType.QUIT))
    osl.process_events(isys)
    isys.update()
    assert osl.quit_requested
    assert isys.is_down(65, DEVICE_KEYBOARD)
    assert any(ev.text == "a" for ev in isys.events)


def test_os_gamepad_surface():
    from lumixengine_tpu.core.os import Event, EventType, OSLayer
    from lumixengine_tpu.engine.input import DEVICE_CONTROLLER, InputSystem

    osl = OSLayer()
    isys = InputSystem()
    osl.backend.push(Event(EventType.GAMEPAD_CONNECTED, gamepad=0))
    osl.process_events(isys)
    assert osl.gamepad(0) is not None and osl.gamepad(0).connected
    osl.set_gamepad_axis(0, 0, 0.5, -0.25, input_system=isys)
    osl.set_gamepad_button(0, 3, True, input_system=isys)
    isys.update()
    assert isys.axis(0, DEVICE_CONTROLLER) == (0.5, -0.25)
    assert isys.is_down(3, DEVICE_CONTROLLER)
    osl.rumble(0, 0.3, 0.9)
    assert osl.gamepad(0).rumble == (0.3, 0.9)
    osl.backend.push(Event(EventType.GAMEPAD_DISCONNECTED, gamepad=0))
    osl.process_events(isys)
    assert osl.gamepad(0) is None


def test_os_clipboard_and_process():
    from lumixengine_tpu.core.os import OSLayer

    osl = OSLayer()
    osl.copy_to_clipboard("hello")
    assert osl.get_clipboard() == "hello"
    assert OSLayer.get_cpus_count() >= 1
    assert OSLayer.get_process_memory() > 0


# ---------------------------------------------------------------------------
# widened script API (≙ lua_api.cpp: entity surface, timers, prefab
# instantiation, cross-script environments, input queries)

def _script_world():
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.script.module import ScriptSystem

    engine = Engine()
    engine.add_system(ScriptSystem(engine))
    world = engine.create_world(capacity=32)
    return engine, world, world.modules["script"]


def test_script_api_entities_and_timers():
    engine, world, sm = _script_world()
    target = world.create_entity(position=(1, 2, 3), name="target")
    host = world.create_entity(name="host")
    src = """
hits = []
def start():
    e = find_entity("target")
    hits.append(tuple(e.position))
    spawned = create_entity(position=(9.0, 0.0, 0.0), name="spawned")
    hits.append(spawned.name)
    set_timer(0.05, lambda: hits.append("timer"))

def update(dt):
    pass
"""
    world.create_component(host, "inline_script", source=src, name="s1")
    sm.start_game()
    env = sm.scripts[host][0]
    assert env.error is None
    assert env.globals["hits"][0] == (1.0, 2.0, 3.0)
    assert env.globals["hits"][1] == "spawned"
    assert world.find_by_name("spawned") >= 0
    # timer fires once after its delay
    sm.update_host(0.03)
    assert "timer" not in env.globals["hits"]
    sm.update_host(0.03)
    assert "timer" in env.globals["hits"]
    sm.update_host(0.1)
    assert env.globals["hits"].count("timer") == 1


def test_script_cross_environment_and_prefab():
    from lumixengine_tpu.engine import serialize as ser

    engine, world, sm = _script_world()
    a = world.create_entity(name="a")
    b = world.create_entity(name="b")
    world.create_component(a, "inline_script", source="shared = {'gold': 7}",
                           name="inv")
    src_b = """
def start():
    env = get_script_env(find_entity("a"), "inv")
    global gold
    gold = env["shared"]["gold"]
"""
    world.create_component(b, "inline_script", source=src_b, name="reader")
    sm.start_game()
    assert sm.scripts[b][0].globals["gold"] == 7

    # prefab instantiation from a script
    p = world.create_entity(position=(0, 0, 0), name="proto")
    blob = ser.make_prefab(world, [p])
    c = world.create_entity()
    world.create_component(c, "inline_script", name="spawner", source="""
def start():
    roots = instantiate_prefab(PREFAB, position=(5.0, 0.0, 0.0))
    global spawned_x
    spawned_x = float(roots[0].position[0])
""")
    sm.scripts[c][0].globals["PREFAB"] = blob
    sm.scripts[c][0].call("start")
    assert abs(sm.scripts[c][0].globals["spawned_x"] - 5.0) < 1e-5


def test_os_gamepad_registry_without_input_system_and_wheel():
    """Review fixes: gamepad connect/disconnect maintains the registry even
    with no InputSystem attached; mouse wheel forwards as mouse axis 1."""
    from lumixengine_tpu.core.os import Event, EventType, OSLayer
    from lumixengine_tpu.engine.input import DEVICE_MOUSE, InputSystem

    osl = OSLayer()
    osl.backend.push(Event(EventType.GAMEPAD_CONNECTED, gamepad=2))
    osl.process_events()                       # no input system
    assert osl.gamepad(2) is not None and osl.gamepad(2).connected
    isys = InputSystem()
    osl.backend.push(Event(EventType.MOUSE_WHEEL, amount=-3.0))
    osl.process_events(isys)
    isys.update()
    assert isys.axis(1, DEVICE_MOUSE) == (-3.0, 0.0)


def test_script_raycast_against_sim_state():
    """Scripts raycast against the previous frame's physics state
    (≙ the Lua physics API's raycast)."""
    import jax.numpy as jnp
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.physics.module import PhysicsSystem
    from lumixengine_tpu.script.module import ScriptSystem

    engine = Engine()
    engine.module_capacities = {"actors": 8}
    engine.add_system(PhysicsSystem(engine))
    engine.add_system(ScriptSystem(engine))
    world = engine.create_world(capacity=16)
    wall = world.create_entity(position=(0.0, 1.0, 5.0), name="wall")
    world.create_component(wall, "rigid_actor", motion="static", shape="box",
                           half_extents=(2.0, 2.0, 0.5))
    h = world.create_entity()
    world.create_component(h, "inline_script", name="scanner", source="""
def update(dt):
    global seen, dist
    r = raycast((0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
    if r is not None:
        seen = r[0].name
        dist = r[1]
""")
    sm = world.modules["script"]
    step = engine.build_step(world, donate=False)
    s = step(world.device_state(), jnp.float32(1 / 60))
    sm.latest_state = s
    sm.update_host(1 / 60)
    env = sm.scripts[h][0]
    assert env.error is None
    assert env.globals["seen"] == "wall"
    assert abs(env.globals["dist"] - 4.5) < 1e-3
