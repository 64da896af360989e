"""`.unv` world importer: every demo map must parse byte-exact (the parser
raises on trailing bytes, so a pass means full-format coverage).
≙ reference world.cpp serialize format + each module's serialize."""
import glob
import os

import pytest

from lumixengine_tpu.importers import unv

MAPS = sorted(glob.glob("/root/reference/demo/maps/*/*.unv"))

pytestmark = pytest.mark.skipif(not MAPS, reason="reference demo maps not present")


@pytest.mark.parametrize("path", MAPS, ids=[os.path.basename(p) for p in MAPS])
def test_map_parses_byte_exact(path):
    scene = unv.load_unv(path)
    assert len(scene["entities"]) > 0
    ids = {e["entity"] for e in scene["entities"]}
    for h in scene["hierarchy"]:
        assert h["entity"] in ids
        if h["parent"] != -1:
            assert h["parent"] in ids


def test_anim_stress_contents():
    s = unv.load_unv("/root/reference/demo/maps/anim_stress_test/anim_stress_test.unv")
    assert len(s["entities"]) == 5627
    mi = s["renderer"]["model_instances"]
    assert sum(1 for m in mi if m["model"] == "models/ybot/ybot.fbx") == 5625
    assert len(s["animation"]["animables"]) == 5625
    # every animable references a .fbx-embedded clip
    assert all(a["animation"].startswith(".ani:") for a in s["animation"]["animables"])


def test_physics_stress_contents():
    s = unv.load_unv("/root/reference/demo/maps/physics_stress_test/physics_stress_test.unv")
    actors = s["physics"]["actors"]
    assert len(actors) == 5881
    dyn = [a for a in actors if a["dynamic_type"] == 1]
    assert len(dyn) > 5000
    # every dynamic actor carries a box geom with half extents
    g = dyn[0]["geoms"][0]
    assert g["type"] == 3 and len(g["half_extents"]) == 3


def test_demo_contents():
    s = unv.load_unv("/root/reference/demo/maps/demo/demo.unv")
    kinds = {j["kind"] for j in s["physics"]["joints"]}
    assert kinds == {"spherical", "hinge"}
    assert len(s["gui"]["rects"]) > 0
    assert len(s["lua_script"]["scripts"]) > 0
    assert s["names"]  # entities have names


def test_particles_map_scripts():
    s = unv.load_unv("/root/reference/demo/maps/particles/particles.unv")
    res = {p["resource"] for p in s["renderer"]["particle_emitters"]}
    assert "maps/particles/fireworks.pat" in res
    assert "maps/particles/ribbons.pat" in res
    assert "maps/particles/mesh_particle.pat" in res


def test_core_signals_instantiate():
    """Core-module signal records wire into the CoreModule on import
    (≙ core.cpp CoreModuleImpl::deserialize SIGNALS block). No shipped map
    carries signals yet (the feature postdates the demo content), so this
    feeds a synthetic parsed scene through the same instantiate path."""
    from lumixengine_tpu.importers.instantiate import instantiate_scene

    scene = {
        "version": 1,
        "entities": [{"entity": 0, "pos": (0, 0, 0),
                      "rot": (0, 0, 0, 1), "scale": (1, 1, 1)}],
        "names": {0: "sig_holder"},
        "hierarchy": [],
        "core": {"signals": [{"entity": 0,
                              "event_module": "gui",
                              "event": "buttonClicked",
                              "function_module": "lua_script",
                              "function": "call"}],
                 "splines": []},
    }
    inst = instantiate_scene(scene, data_dirs=())
    cm = inst.world.modules["core"]
    assert inst.report["signal"] == 1
    sig = cm.signals[inst.emap[0]]
    assert sig["event_component"] == "gui" and sig["event"] == "buttonClicked"
    # reference module name "lua_script" normalizes to this engine's "script"
    assert sig["function_component"] == "script" and sig["function"] == "call"


def test_unv_writer_roundtrips_all_maps():
    """write_unv is the save half of the importer (≙ world.cpp:837-897
    serialize + each module's serialize): every shipped demo map parses,
    re-serializes, and re-parses to a semantically identical scene dict.
    Byte-identity of the uncompressed body holds for maps without
    parser-discarded regions (struct pad bytes, named-partition tables)."""
    import numpy as np
    from lumixengine_tpu.importers.unv_write import write_unv

    def deep_eq(a, b):
        if isinstance(a, dict):
            assert set(a) == set(b)
            for k in a:
                deep_eq(a[k], b[k])
        elif isinstance(a, (list, tuple)):
            assert len(a) == len(b)
            for x, y in zip(a, b):
                deep_eq(x, y)
        elif isinstance(a, np.ndarray):
            assert (np.asarray(a) == np.asarray(b)).all()
        else:
            assert a == b or (a != a and b != b)  # NaN-safe

    for p in MAPS:
        s1 = unv.parse_unv(open(p, "rb").read())
        s2 = unv.parse_unv(write_unv(s1))
        deep_eq(s1, s2)


def test_editor_save_roundtrip(tmp_path):
    """The editor-save path (≙ WorldEditor save → world.cpp serialize):
    load demo.unv, move + rename one entity, destroy another, save as .unv,
    reload — the edits persist and the destroyed entity's components are
    pruned from every module blob."""
    import numpy as np
    from lumixengine_tpu.importers.instantiate import load_world, save_world_unv

    inst = load_world("/root/reference/demo/maps/demo/demo.unv")
    world = inst.world
    player = world.find_by_name("player")
    if player < 0:
        player = inst.emap[1]
    world.set_global_transform(player, position=(7.5, 2.0, -3.25))
    world.set_entity_name(player, "hero")
    victim_src, victim = next(
        (s, e) for s, e in inst.emap.items()
        if world.has_component(e, "rigid_actor") and e != player)
    world.destroy_entity(victim)

    out = str(tmp_path / "demo_edited.unv")
    save_world_unv(inst, out)
    re = load_world(out)
    hero = re.world.find_by_name("hero")
    assert hero >= 0
    pos, _, _ = re.world.get_global_transform(hero)
    np.testing.assert_allclose(pos, (7.5, 2.0, -3.25), atol=1e-6)
    assert victim_src not in re.emap
    assert re.report["rigid_actor"] == inst.report["rigid_actor"] - 1
    # untouched content survives: scripts, gui, joints against the dead body
    assert re.report["script"] == inst.report["script"]
    assert re.report["gui_rect"] == inst.report["gui_rect"]


def test_export_preserves_hierarchy_links():
    """Exported hierarchy records carry consistent first_child/next_sibling
    links (the reference loads the array raw, so links must be valid)."""
    from lumixengine_tpu.importers.instantiate import load_world, export_scene

    inst = load_world("/root/reference/demo/maps/demo/demo.unv")
    scene = export_scene(inst)
    by_e = {h["entity"]: h for h in scene["hierarchy"]}
    for h in scene["hierarchy"]:
        if h["parent"] >= 0:
            p = by_e[h["parent"]]
            # walk the sibling chain from the parent's first child; must hit h
            cur, seen = p["first_child"], set()
            while cur != -1 and cur not in seen:
                if cur == h["entity"]:
                    break
                seen.add(cur)
                cur = by_e[cur]["next_sibling"]
            assert cur == h["entity"], (h, p)


def test_export_new_entities(tmp_path):
    """Entities created after load export with fresh source ids — camera /
    point_light components and new-entity hierarchy links included."""
    from lumixengine_tpu.importers.instantiate import load_world, save_world_unv

    inst = load_world("/root/reference/demo/maps/tetris/tetris.unv")
    w = inst.world
    cam = w.create_entity(position=(1.0, 2.0, 3.0), name="new_cam")
    w.create_component(cam, "camera", fov=0.9)
    light = w.create_entity(position=(0.0, 5.0, 0.0), name="new_light")
    w.create_component(light, "point_light", color=(1.0, 0.5, 0.2),
                       intensity=2.0, range=15.0)
    w.set_parent(light, cam)

    out = str(tmp_path / "tetris_edited.unv")
    save_world_unv(inst, out)
    re = load_world(out)
    c2 = re.world.find_by_name("new_cam")
    l2 = re.world.find_by_name("new_light")
    assert c2 >= 0 and l2 >= 0
    rm = re.world.modules["renderer"]
    assert abs(float(rm.cameras.get(c2, "fov")) - 0.9) < 1e-6
    assert float(rm.point_lights.get(l2, "range")) == 15.0
    assert re.world.get_parent(l2) == c2
    assert re.report["script"] == 1  # original content intact

    # new rigid actors export with their geoms + ccd flag
    w2 = re.world
    box = w2.create_entity(position=(0, 8, 0), name="new_box")
    w2.create_component(box, "rigid_actor", motion="dynamic", shape="box",
                        half_extents=(0.4, 0.3, 0.2), ccd=True)
    out2 = str(tmp_path / "tetris_edited2.unv")
    save_world_unv(re, out2)
    re2 = load_world(out2)
    b2 = re2.world.find_by_name("new_box")
    pm = re2.world.modules["physics"]
    assert b2 >= 0 and bool(pm.actors.get(b2, "ccd"))
    import numpy as np
    np.testing.assert_allclose(pm.actors.get(b2, "half_extents"),
                               (0.4, 0.3, 0.2))


def test_partitions_roundtrip_through_save(tmp_path):
    """Named partitions round-trip the save path: the table ({u16 handle;
    char name[64]} + u16 active, world.cpp:884-888/1030-1032) and per-entity
    tags. No shipped map carries records, so this drives the additive flow:
    create a partition, tag an entity, save, reload."""
    from lumixengine_tpu.importers.instantiate import load_world, save_world_unv

    inst = load_world("/root/reference/demo/maps/tetris/tetris.unv")
    w = inst.world
    p = w.create_partition("level2")
    w.set_active_partition(p)
    w.create_entity(position=(1, 1, 1), name="lvl2_ent")

    out = str(tmp_path / "parts.unv")
    save_world_unv(inst, out)
    re = load_world(out)
    assert re.world.partitions == ["main", "level2"]
    assert re.world.active_partition == 1
    e2 = re.world.find_by_name("lvl2_ent")
    assert int(re.world.partition_of[e2]) == 1


def test_imported_signal_dispatches():
    """ADVICE-r3 medium #1: .unv signals store MODULE names; dispatch must
    resolve them. gui's buttonClicked is a module-scoped event
    (≙ gui_module.h:153-159), lua_script's "call" resolves to this engine's
    script module's reflected function, which invokes onSignal() in the
    target entity's scripts."""
    from lumixengine_tpu.importers.instantiate import instantiate_scene

    scene = {
        "version": 1,
        "entities": [{"entity": 0, "pos": (0, 0, 0),
                      "rot": (0, 0, 0, 1), "scale": (1, 1, 1)}],
        "names": {0: "button"},
        "hierarchy": [],
        "lua_script": {"scripts": [], "inline_scripts": [
            {"entity": 0,
             "source": "fired = 0\nfunction onSignal() fired = fired + 1 end"}]},
        "core": {"signals": [{"entity": 0,
                              "event_module": "gui",
                              "event": "buttonClicked",
                              "function_module": "lua_script",
                              "function": "call"}],
                 "splines": []},
    }
    inst = instantiate_scene(scene, data_dirs=())
    cm = inst.world.modules["core"]
    e = inst.emap[0]
    # module names normalized to this engine's registry scopes
    assert cm.signals[e]["function_component"] == "script"
    n = cm.dispatch_signals([
        {"module": "gui", "event": "buttonClicked", "entity": e}])
    assert n == 1
    env = inst.world.modules["script"].lua_envs[e][0]
    assert float(env.env.get("fired")) == 1.0
    # wrong event name does not fire
    assert cm.dispatch_signals([
        {"module": "gui", "event": "rectHovered", "entity": e}]) == 0


def test_export_writes_back_live_properties(tmp_path):
    """ADVICE-r3 medium #2: editor property edits (set_property → live
    stores) must survive export; stale parsed records would silently lose
    them."""
    from lumixengine_tpu.engine import reflection
    from lumixengine_tpu.importers.instantiate import (
        export_scene, instantiate_scene)

    reflection.register_builtin_components()
    scene = {
        "version": 1,
        "entities": [{"entity": 0, "pos": (0, 0, 0), "rot": (0, 0, 0, 1),
                      "scale": (1, 1, 1)},
                     {"entity": 1, "pos": (1, 0, 0), "rot": (0, 0, 0, 1),
                      "scale": (1, 1, 1)}],
        "names": {0: "cam", 1: "light"},
        "hierarchy": [],
        "renderer": {
            "cameras": [{"entity": 0, "fov": 1.0, "near": 0.1, "far": 100.0,
                         "ortho_size": 10.0, "screen_width": 1920.0,
                         "screen_height": 1080.0, "is_ortho": False}],
            "point_lights": [{"entity": 1, "color": (1.0, 1.0, 1.0),
                              "intensity": 2.0, "fov": 6.2831855,
                              "attenuation": 1.0, "range": 5.0, "flags": 0,
                              "guid": 7}],
            "model_instances": [], "environments": [], "terrains": [],
            "particle_emitters": [], "bone_attachments": [],
            "environment_probes": [], "reflection_probes": [], "decals": [],
            "curve_decals": [], "instanced_models": [],
            "procedural_geometries": []},
    }
    inst = instantiate_scene(scene, data_dirs=())
    w = inst.world
    cam_e, light_e = inst.emap[0], inst.emap[1]
    reflection.registry.set_property(w, cam_e, "camera", "fov", 0.7)
    reflection.registry.set_property(w, cam_e, "camera", "is_ortho", True)
    reflection.registry.set_property(w, cam_e, "camera", "ortho_size", 25.0)
    reflection.registry.set_property(w, light_e, "point_light", "intensity", 9.0)

    out = export_scene(inst)
    cam = out["renderer"]["cameras"][0]
    assert abs(cam["fov"] - 0.7) < 1e-6
    assert cam["is_ortho"] is True and abs(cam["ortho_size"] - 25.0) < 1e-6
    pl = out["renderer"]["point_lights"][0]
    assert abs(pl["intensity"] - 9.0) < 1e-6
    assert pl["guid"] == 7  # untouched parsed fields keep their values

    # a NEW ortho camera round-trips as ortho with live values (ADVICE low #3)
    e2 = w.create_entity(name="cam2")
    w.create_component(e2, "camera", fov=0.5, near=1.0, far=10.0,
                       ortho_size=3.0, is_ortho=True)
    e3 = w.create_entity(name="light2")
    w.create_component(e3, "point_light", intensity=1.0, range=2.0)
    out2 = export_scene(inst)
    new_cam = [c for c in out2["renderer"]["cameras"]
               if c["entity"] not in (0,)][0]
    assert new_cam["is_ortho"] is True and abs(new_cam["ortho_size"] - 3.0) < 1e-6
    new_pl = [p for p in out2["renderer"]["point_lights"]
              if p["entity"] not in (1,)][0]
    assert new_pl["guid"] > 7  # no guid collision with existing lights
