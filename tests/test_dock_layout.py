"""Docked split layout (≙ reference StudioApp dockspace — several windows
visible at once): 'D' cycles a secondary bottom pane while the focused view
keeps the keys."""
from lumixengine_tpu.core import log as core_log
from lumixengine_tpu.editor.app import EditorApp
from lumixengine_tpu.models import demo_scenes


def test_dock_cycles_and_splits_the_screen():
    engine, world, _ = demo_scenes.headless_demo_world(num_entities=32)
    app = EditorApp(engine, world)

    # undocked: the main view fills the screen
    txt = app.render_text(80, 24)
    assert "lumixengine_tpu editor" in txt and "─" * 80 not in txt

    app.handle_key(0, "D")
    assert app.dock == "log"
    app.render_text(80, 24)                   # constructs + subscribes log
    core_log.log_warning("dock", "visible in the split")
    txt = app.render_text(80, 24)
    lines = txt.splitlines()
    assert "lumixengine_tpu editor" in lines[0]          # focused view on top
    assert "─" * 80 in txt                               # separator
    assert "visible in the split" in txt                 # dock content below
    assert len(lines) <= 24

    # keys still go to the FOCUSED view, not the dock
    n0 = world.entity_count
    app.handle_key(0, "x")                    # main-view: destroy selection
    assert world.entity_count == n0 - 1
    app.stack.undo()

    # cycle: log → profiler → scene → off
    app.handle_key(0, "D")
    assert app.dock == "profiler"
    assert "profiler" in app.render_text(80, 24)
    app.handle_key(0, "D")
    assert app.dock == "scene"
    app.handle_key(0, "D")
    assert app.dock is None

    # docking works from a sub-view too (focused view on top, dock below)
    app.handle_key(0, "3")                    # profiler view
    app.handle_key(0, "D")
    assert app.dock == "log" and app.view == "profiler"
    txt = app.render_text(80, 24)
    assert "profiler" in txt.splitlines()[0].lower() or \
        "profiler" in txt
    assert "visible in the split" in txt
    app.log_ui().close()
