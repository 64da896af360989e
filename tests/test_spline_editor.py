"""Spline editor (editor/spline_editor.py ≙ reference
editor/spline_editor.cpp:1-279): point table edits, append/delete/nudge
through undoable SetSplinePointsCommands (merging nudge runs), scene-view
overlay gizmos."""
import numpy as np

from lumixengine_tpu.engine.engine import Engine

_UP, _DOWN, _ENTER = 0x26, 0x28, 13


def _world():
    from lumixengine_tpu.engine.core_module import CoreSystem

    engine = Engine()
    engine.add_system(CoreSystem(engine))
    world = engine.create_world(capacity=8)
    e = world.create_entity(position=(10.0, 0.0, 0.0), name="track")
    world.create_component(e, "spline",
                           points=[[0, 0, 0], [2, 0, 0], [4, 1, 0]])
    return engine, world, e


def test_spline_edit_append_delete_nudge_undo():
    from lumixengine_tpu.editor.commands import CommandStack
    from lumixengine_tpu.editor.spline_editor import SplineEditor

    engine, world, e = _world()
    stack = CommandStack(world)
    ed = SplineEditor(engine, world, stack)
    assert ed.entity() == e and len(ed.points()) == 3

    # append at tail, then undo restores the original array
    ed.handle_key(0, "a")
    assert len(ed.points()) == 4 and ed.sel_point == 3
    stack.undo()
    assert len(ed.points()) == 3

    # a run of nudges on ONE point merges into ONE undo step
    n0 = len(stack._undo)
    ed.sel_point = 1
    ed.handle_key(0, "l")
    ed.handle_key(0, "l")
    ed.handle_key(0, "o")
    assert len(stack._undo) == n0 + 1
    np.testing.assert_allclose(ed.points()[1], [3.0, 0.5, 0.0])
    stack.undo()
    np.testing.assert_allclose(ed.points()[1], [2.0, 0.0, 0.0])

    # typed coordinate edit
    ed.sel_point = 2
    ed.handle_key(_ENTER)
    for ch in "5 2 -1":
        ed.handle_key(0, ch)
    ed.handle_key(_ENTER)
    np.testing.assert_allclose(ed.points()[2], [5.0, 2.0, -1.0])

    # delete
    ed.handle_key(0, "x")
    assert len(ed.points()) == 2
    stack.undo()
    assert len(ed.points()) == 3

    # overlay: polyline in entity-world space (origin x=10 applied)
    segs = ed.overlay_segments()
    polys = [s for s in segs if s[2] == (60, 220, 60)]
    assert len(polys) == 2
    np.testing.assert_allclose(polys[0][0], [10.0, 0.0, 0.0])
    sel = [s for s in segs if s[2] == (250, 220, 40)]
    assert len(sel) == 2                    # the selected point's marker

    txt = ed.render_text(80, 16)
    assert "spline editor" in txt and "[  2]" in txt


def test_spline_bank_updates_after_edit():
    """The device SplineBank rebakes after an edit (cache invalidation)."""
    from lumixengine_tpu.editor.commands import CommandStack
    from lumixengine_tpu.editor.spline_editor import SplineEditor

    engine, world, e = _world()
    core = world.modules["core"]
    t0 = float(core.bank.total_len[0])
    ed = SplineEditor(engine, world, CommandStack(world))
    ed.sel_point = 2
    ed.handle_key(0, "l")                   # +0.5 on x extends the spline
    t1 = float(core.bank.total_len[0])
    assert t1 > t0


def test_editor_app_spline_view():
    from lumixengine_tpu import app as app_mod
    from lumixengine_tpu.editor.app import EditorApp

    engine = app_mod.create_full_engine()
    world = engine.create_world(capacity=16)
    cam = world.create_entity(position=(0.0, 2.0, 10.0), name="camera")
    world.create_component(cam, "camera")
    # no splines yet → view refuses with a status message
    app = EditorApp(engine, world)
    app.handle_key(0, ".")
    assert app.view == "main" and "no splines" in app.status

    e = world.create_entity(name="track")
    world.modules["core"].create_component(e, "spline",
                                           points=[[0, 0, 0], [1, 0, 0]])
    app.handle_key(0, ".")
    assert app.view == "spline"
    assert "spline editor" in app.render_text(80, 16)
    assert app.scene_view().overlays           # gizmos registered
    app.handle_key(27)
    assert app.view == "main"
