"""Terminal editor application (≙ StudioApp/WorldEditor shell —
editor/app.py): pure key-state-machine + screen composer, driven headlessly."""
import numpy as np

from lumixengine_tpu.editor.app import EditorApp
from lumixengine_tpu.models import demo_scenes

UP, DOWN, TAB, ENTER = 0x26, 0x28, 9, 13


def _app(n=64):
    engine, world, renderer = demo_scenes.headless_demo_world(num_entities=n)
    return EditorApp(engine, world), world


def _type(app, s):
    for ch in s:
        app.handle_key(0, ch)


def test_tree_renders_and_navigates():
    app, world = _app()
    screen = app.render_text(100, 24)
    assert "entities" in screen and "camera" in screen
    first = app.selected_entity()
    app.handle_key(DOWN)
    assert app.selected_entity() != first
    app.handle_key(UP)
    assert app.selected_entity() == first


def test_property_grid_lists_reflected_props():
    app, world = _app()
    # camera entity: transform rows + camera component properties
    ents = app.entities()
    app.sel = next(i for i, (e, _) in enumerate(ents)
                   if world.get_entity_name(e) == "camera")
    rows = app.prop_rows(app.selected_entity())
    kinds = {(c, p) for c, p, _ in rows}
    assert ("transform", "x") in kinds
    assert any(c == "camera" for c, p, _ in rows)


def test_edit_transform_commits_through_undo_stack():
    app, world = _app()
    e = app.selected_entity()
    before = float(np.asarray(world.get_local_transform(e)[0])[0])
    app.handle_key(TAB)                  # props panel
    app.prop_sel = 0                     # transform.x
    app.handle_key(ENTER)                # start edit
    _type(app, "42.5")
    app.handle_key(ENTER)                # commit
    assert float(np.asarray(world.get_local_transform(e)[0])[0]) == 42.5
    app.handle_key(0, "u")               # undo
    assert float(np.asarray(world.get_local_transform(e)[0])[0]) == before
    app.handle_key(0, "y")               # redo
    assert float(np.asarray(world.get_local_transform(e)[0])[0]) == 42.5


def test_edit_reflected_component_property():
    app, world = _app()
    ents = app.entities()
    app.sel = next(i for i, (e, _) in enumerate(ents)
                   if world.get_entity_name(e) == "camera")
    e = app.selected_entity()
    rows = app.prop_rows(e)
    app.prop_sel = next(i for i, (c, p, _) in enumerate(rows)
                        if c == "camera" and np.isscalar(rows[i][2]))
    ctype, pname, old = rows[app.prop_sel]
    app.panel = "props"
    app.handle_key(ENTER)
    _type(app, "0.75")
    app.handle_key(ENTER)
    from lumixengine_tpu.engine import reflection

    assert float(reflection.registry.get_property(
        world, e, ctype, pname)) == 0.75


def test_create_destroy_save_quit(tmp_path):
    engine, renderer = demo_scenes.build_engine(model_instances=16)
    world = engine.create_world(capacity=16)
    world.create_entity(name="camera")
    app = EditorApp(engine, world)
    n0 = world.entity_count
    app.handle_key(0, "n")
    assert world.entity_count == n0 + 1
    app.handle_key(0, "x")               # destroy selected
    app.handle_key(0, "u")               # undo destroy
    assert world.entity_count == n0 + 1
    app.save_path = str(tmp_path / "edited.sav")
    app.handle_key(0, "s")
    assert (tmp_path / "edited.sav").stat().st_size > 100
    app.handle_key(0, "q")
    assert app.quit_requested


def test_screen_shows_edit_buffer_and_status():
    app, world = _app()
    app.handle_key(TAB)
    app.handle_key(ENTER)
    _type(app, "1.5")
    s = app.render_text(100, 24)
    assert "1.5_" in s                   # live edit cursor
    app.handle_key(ENTER)
    assert "= 1.5" in app.status
