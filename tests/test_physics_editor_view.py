"""Physics editor view (editor/physics_view.py) — the TUI equivalent of the
reference physics editor plugin (physics/editor/physics_plugins.cpp:1-1045):
joint table + scene-view joint gizmos, collision-layer matrix editing
persisted through world save/load."""
import numpy as np
import pytest

from lumixengine_tpu.engine.engine import Engine
from lumixengine_tpu.physics.module import PhysicsSystem

_UP, _DOWN, _LEFT, _RIGHT = 0x26, 0x28, 0x25, 0x27


def build_joint_world():
    engine = Engine()
    engine.module_capacities = {"actors": 8, "joints": 4}
    phys = PhysicsSystem(engine)
    engine.add_system(phys)
    world = engine.create_world(capacity=16)
    a = world.create_entity(position=(0.0, 4.0, 0.0), name="anchor")
    b = world.create_entity(position=(0.0, 2.0, 0.0), name="bob")
    world.create_component(a, "rigid_actor", motion="static", shape="sphere",
                           radius=0.2)
    world.create_component(b, "rigid_actor", motion="dynamic", shape="box",
                           half_extents=(0.3, 0.3, 0.3))
    world.create_component(b, "hinge_joint", body_a=a, body_b=b,
                           axis=(0.0, 0.0, 1.0), limit=(-0.5, 0.5))
    return engine, world, phys, a, b


def test_joint_table_lists_joints():
    from lumixengine_tpu.editor.physics_view import PhysicsView

    engine, world, phys, a, b = build_joint_world()
    pv = PhysicsView(engine, world)
    rows = pv.joint_rows()
    assert len(rows) == 1
    r = rows[0]
    assert r["type"] == "hinge"
    assert (r["ent_a"], r["ent_b"]) == (a, b)
    assert r["limit_on"] == 1 and r["limit"] == (-0.5, 0.5)
    txt = pv.render_text(100, 24)
    assert "hinge" in txt and f"{a}→{b}" in txt


def test_joint_gizmo_segments_world_space():
    from lumixengine_tpu.editor.physics_view import PhysicsView

    engine, world, phys, a, b = build_joint_world()
    pv = PhysicsView(engine, world)
    segs = pv.overlay_segments()
    # per endpoint: RGB triad (3 segs) ×2 + hinge axis + body link = ≥8
    assert len(segs) >= 8
    # the grey link connects the two body positions
    link = [s for s in segs if s[2] == (130, 130, 130)]
    assert len(link) == 1
    p0, p1, _ = link[0]
    np.testing.assert_allclose(p0, [0, 4, 0], atol=1e-5)
    np.testing.assert_allclose(p1, [0, 2, 0], atol=1e-5)
    # anchor triads sit at the body origins (anchor offsets are zero)
    reds = [s for s in segs if s[2] == (220, 60, 60)]
    assert any(np.allclose(s[0], [0, 4, 0]) for s in reds)


def test_layer_matrix_toggle_and_rename():
    from lumixengine_tpu.editor.physics_view import PhysicsView

    engine, world, phys, a, b = build_joint_world()
    pv = PhysicsView(engine, world)
    pv.handle_key(0, "m")                    # switch to layers mode
    assert pv.mode == "layers"
    pv.handle_key(_DOWN)                     # cursor to (1, 0)
    pv.handle_key(0, " ")                    # toggle 1×0 off
    assert not phys.layer_matrix[1, 0] and not phys.layer_matrix[0, 1]
    pv.handle_key(0, " ")                    # back on
    assert phys.layer_matrix[1, 0]
    # rename layer 1 via the edit buffer ('q' inside the name must not quit
    # — EditorApp checks view.edit, ADVICE-r4 medium)
    pv.handle_key(0, "n")
    assert pv.edit is not None
    for chx in "quiet":
        pv.handle_key(0, chx)
    pv.handle_key(13)
    assert phys.layer_names[1] == "quiet"
    txt = pv.render_text(120, 40)
    assert "quiet" in txt


def test_layer_matrix_persists_through_save():
    from lumixengine_tpu.engine import serialize

    engine, world, phys, a, b = build_joint_world()
    phys.set_layers_collide(2, 5, False)
    phys.layer_names = [f"layer{i}" for i in range(32)]
    phys.layer_names[2] = "debris"
    blob = serialize.serialize_world(world)

    engine2 = Engine()
    engine2.module_capacities = {"actors": 8, "joints": 4}
    phys2 = PhysicsSystem(engine2)
    engine2.add_system(phys2)
    world2 = serialize.load_world(engine2, blob)
    assert not phys2.layer_matrix[2, 5] and not phys2.layer_matrix[5, 2]
    assert phys2.layer_matrix[1, 1]
    assert phys2.layer_names[2] == "debris"
    # the joint also made the round trip
    j = world2.modules["physics"].joints
    assert len(j) == 1


def test_editor_app_physics_view_and_overlay():
    """EditorApp '7' opens the physics view; the scene view rasterizes the
    joint gizmo segments over its presented frame."""
    from lumixengine_tpu.editor.app import EditorApp
    from lumixengine_tpu.models.demo_scenes import build_engine

    engine, renderer = build_engine(model_instances=8)
    engine.module_capacities = {"actors": 8, "joints": 4}
    phys = PhysicsSystem(engine)
    engine.add_system(phys)
    world = engine.create_world(capacity=16)
    a = world.create_entity(position=(0.0, 4.0, 0.0), name="anchor")
    b = world.create_entity(position=(0.0, 2.0, 0.0), name="bob")
    world.create_component(a, "rigid_actor", motion="static", shape="sphere",
                           radius=0.2)
    world.create_component(b, "rigid_actor", motion="dynamic", shape="box",
                           half_extents=(0.3, 0.3, 0.3))
    world.create_component(b, "hinge_joint", body_a=a, body_b=b,
                           axis=(0.0, 0.0, 1.0), limit=(-0.5, 0.5))
    app = EditorApp(engine, world)
    app.handle_key(0, "7")
    assert app.view == "physics"
    txt = app.render_text(100, 24)
    assert "hinge" in txt
    # while renaming a layer, 'q' types into the buffer instead of quitting
    app.handle_key(0, "m")
    app.handle_key(0, "n")
    app.handle_key(0, "q")
    assert not app.quit_requested and app.physics_view().edit == "q"
    app.handle_key(27)                      # cancel rename
    app.handle_key(27)                      # esc back to main
    assert app.view == "main"

    sv = app.scene_view()
    assert sv.overlays                      # physics gizmos registered
    sv.cam_pos = np.array([0.0, 3.0, 8.0], np.float32)
    sv.pitch = 0.0
    sv._apply_camera()
    sv.width, sv.height = 64, 36
    img = sv.frame()
    # gizmo pixels landed: the exact axis colors exist in the image
    flat = img.reshape(-1, 3)
    assert (flat == np.array([220, 60, 60])).all(axis=1).any()
    assert (flat == np.array([130, 130, 130])).all(axis=1).any()
