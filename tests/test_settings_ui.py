"""Settings view (editor/settings_ui.py ≙ reference editor/settings.cpp:
typed option registry + categories + ini persistence + live pointers into
the owning subsystems)."""
import os

from lumixengine_tpu.engine.engine import Engine


def _app(tmp_path, **kw):
    from lumixengine_tpu.editor.app import EditorApp

    engine = Engine()
    world = engine.create_world(capacity=8)
    return EditorApp(engine, world,
                     settings_path=str(tmp_path / "editor.ini"), **kw), engine


def test_settings_edit_applies_live_and_persists(tmp_path):
    app, engine = _app(tmp_path)
    app.handle_key(0, ",")
    assert app.view == "settings"
    ui = app.settings_ui()

    # edit time_multiplier through the key machine → live on the engine
    ui.sel = ui.rows().index("time_multiplier")
    app.handle_key(13)
    for ch in "2.5":
        app.handle_key(0, ch)
    app.handle_key(13)
    assert engine.time_multiplier == 2.5

    # bool rows toggle on enter
    ui.sel = ui.rows().index("autoscroll")
    v0 = app.settings.get("autoscroll")
    app.handle_key(13)
    assert app.settings.get("autoscroll") is (not v0)

    # save writes only modified options; a fresh app loads them back
    app.handle_key(0, "s")
    assert os.path.exists(app.settings_path)
    text = open(app.settings_path).read()
    assert "time_multiplier = 2.5" in text and "[game_view]" in text
    assert "move_speed" not in text            # untouched → not persisted

    app2, engine2 = _app(tmp_path)
    assert engine2.time_multiplier == 2.5      # startup merge (user over
    assert app2.settings.get("autoscroll") is (not v0)  # defaults)

    # reset returns to the default and un-persists
    ui2 = app2.settings_ui()
    ui2.sel = ui2.rows().index("time_multiplier")
    ui2.handle_key(0, "r")
    assert app2.settings.get("time_multiplier") == 1.0
    assert engine2.time_multiplier == 1.0

    app2.handle_key(0, ",")
    txt = app2.render_text(80, 20)
    assert "settings" in txt and "time_multiplier" in txt


def test_settings_push_into_scene_view(tmp_path):
    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.editor.app import EditorApp

    engine, world, _ = demo_scenes.headless_demo_world(num_entities=32)
    app = EditorApp(engine, world,
                    settings_path=str(tmp_path / "editor.ini"))
    app.settings.set("move_speed", 7.5)
    app._apply_setting("move_speed")           # no live view yet: no-op
    sv = app.scene_view()                      # construction applies it
    assert sv.move_speed == 7.5
    app.settings.set("move_speed", 3.25)
    app.settings_ui().on_change("move_speed")  # live push path
    assert sv.move_speed == 3.25

    # a garbage typed value is rejected, option unchanged
    ui = app.settings_ui()
    ui.sel = ui.rows().index("move_speed")
    ui.handle_key(13)
    for ch in "abc":
        ui.handle_key(0, ch)
    ui.handle_key(13)
    assert "bad value" in ui.status
    assert app.settings.get("move_speed") == 3.25
