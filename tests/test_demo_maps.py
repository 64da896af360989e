"""The reference's de-facto integration suite is its demo maps (SURVEY §4):
instantiate every shipped .unv into a live World and tick the fused step.
≙ Runner::loadWorld → World::deserialize → engine update loop
(/root/reference/src/app/main.cpp:118, src/engine/world.cpp:899)."""
import glob
import os

import jax.numpy as jnp
import pytest

import functools

from lumixengine_tpu.importers.instantiate import load_world as _load_world


@functools.lru_cache(maxsize=None)
def load_world(path):
    """Session-memoized: several tests inspect the same map; instantiation
    (FBX parse + physics cooking) dominates suite wall time otherwise. Tests
    only read the host World and tick fresh device states, so sharing is
    safe."""
    return _load_world(path)

MAPS = sorted(glob.glob("/root/reference/demo/maps/*/*.unv"))

pytestmark = pytest.mark.skipif(not MAPS, reason="reference demo maps not present")


@pytest.mark.slow  # 26 s: per-map coverage stays fast via parse + component-count tests
def test_all_demo_maps_instantiate():
    assert len(MAPS) == 12
    for p in MAPS:
        inst = load_world(p)
        assert inst.report["entities"] == len(inst.emap)
        assert len(inst.emap) > 0


@pytest.mark.parametrize("name,expect", [
    ("demo/demo.unv", {"rigid_actor": 39, "joint": 8, "script": 11,
                       "gui_rect": 16, "nav_agent": 1}),
    ("tetris/tetris.unv", {"gui_rect": 2, "script": 1, "camera": 1}),
    ("instanced_models/instanced_models.unv", {"instanced_model": 2}),
])
def test_map_component_counts(name, expect):
    inst = load_world(f"/root/reference/demo/maps/{name}")
    for k, v in expect.items():
        assert inst.report[k] == v, (k, inst.report)


@pytest.mark.parametrize("name", [
    pytest.param("demo/demo.unv", marks=pytest.mark.slow),  # 39 actors + lua
    "tetris/tetris.unv", "particles/particles.unv",
])
def test_small_maps_tick(name):
    inst = load_world(f"/root/reference/demo/maps/{name}")
    rmod = inst.world.modules["renderer"]
    extra = (lambda ws, dt: rmod.cull_pass(ws, dt)) if rmod.active_camera >= 0 else None
    step = inst.engine.build_step(inst.world, extra=extra, donate=False)
    s = inst.world.device_state()
    for _ in range(3):
        s = step(s, jnp.float32(1 / 60))
    assert int(s.frame) == 3


@pytest.mark.slow
def test_stress_maps_tick():
    for name in ("physics_stress_test/physics_stress_test.unv",
                 "anim_stress_test/anim_stress_test.unv"):
        inst = load_world(f"/root/reference/demo/maps/{name}")
        step = inst.engine.build_step(inst.world, donate=False)
        s = inst.world.device_state()
        for _ in range(3):
            s = step(s, jnp.float32(1 / 60))
        assert int(s.frame) == 3


def test_stress_map_counts():
    inst = load_world("/root/reference/demo/maps/anim_stress_test/anim_stress_test.unv")
    assert inst.report["animable"] == 5625
    assert inst.report["model_instance"] == 5626
    inst = load_world("/root/reference/demo/maps/physics_stress_test/physics_stress_test.unv")
    assert inst.report["rigid_actor"] == 5881
    # SAP broadphase auto-engages above the threshold
    assert inst.world.modules["physics"].sap_active()


@pytest.mark.slow
def test_anp_property_animators_drive_demo_platform():
    """demo.unv's moving platform (platform.anp Position X curve) and the
    pulsing button labels (Scale X/Y) import and animate in the fused step
    (≙ property_animation.cpp + updatePropertyAnimators)."""
    from lumixengine_tpu.importers.anp import parse_anp, to_component_curves

    with open("/root/reference/demo/maps/demo/platform.anp") as f:
        curves = parse_anp(f.read())
    assert curves and curves[0]["type"] == "Position X"
    # old format: frames at 30 fps → seconds
    assert abs(curves[0]["times"][-1] - 4.0) < 1e-6
    cc = to_component_curves(curves)
    assert cc[0]["component"] == "transform" and cc[0]["property"] == "x"

    inst = load_world("/root/reference/demo/maps/demo/demo.unv")
    assert inst.report["property_animator"] >= 3
    am = inst.world.modules["animation"]
    e = next(iter(am.property_animators))
    slot = inst.world.slot(e)
    step = inst.engine.build_step(inst.world, donate=False)
    s = inst.world.device_state()
    vals = []
    for i in range(20):
        s = step(s, jnp.float32(0.25))
        row = am.property_animators[e][0]
        axis = {"x": 0, "y": 1, "z": 2, "scale_x": 0, "scale_y": 1,
                "scale_z": 2}[row["property"]]
        field = "scale" if row["property"].startswith("scale") else "pos"
        vals.append(float(getattr(s.local, field)[axis, slot]))
    # the animated channel actually moves over time
    assert max(vals) - min(vals) > 0.5, vals
