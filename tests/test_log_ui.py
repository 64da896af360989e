"""Log view (editor/log_ui.py ≙ reference editor/log_ui.cpp:1-252):
log fan-out subscription, level toggles, text filter, unread counts,
timed notifications."""
from lumixengine_tpu.core import log as core_log


def _ui(clock=None):
    from lumixengine_tpu.editor.log_ui import LogUI

    return LogUI(**({"clock": clock} if clock else {}))


def test_log_ui_captures_filters_and_counts():
    ui = _ui()
    try:
        core_log.log_info("renderer", "baked 3 models")
        core_log.log_warning("physics", "broadphase window miss")
        core_log.log_error("asset", "cannot open foo.fbx")
        assert len(ui.messages) == 3
        assert ui.new_count == {0: 1, 1: 1, 2: 1}

        # level toggles (≙ the info/warnings/errors checkboxes)
        ui.handle_key(0, "i")
        assert [m[0] for m in ui.visible()] == [1, 2]
        ui.handle_key(0, "i")

        # substring filter through the typing state machine
        ui.handle_key(0, "f")
        for ch in "physics":
            ui.handle_key(0, ch)
        ui.handle_key(13)
        vis = ui.visible()
        assert len(vis) == 1 and vis[0][1] == "physics"

        # typing 'q' into the filter must not be interpreted as quit by the
        # shell (edit-state guard): the edit attr is live while typing
        ui.handle_key(0, "f")
        ui.handle_key(0, "q")
        assert ui.edit == "q"
        ui.handle_key(27)
        ui.filter = ""

        # render clears unread counts (≙ onGUI resetting m_new_message_count)
        txt = ui.render_text(80, 12)
        assert "broadphase" in txt and "cannot open" in txt
        assert ui.new_count == {0: 0, 1: 0, 2: 0}

        ui.handle_key(0, "c")
        assert not ui.messages
    finally:
        ui.close()


def test_log_ui_notifications_fade():
    t = [0.0]
    ui = _ui(clock=lambda: t[0])
    try:
        core_log.log_error("engine", "boom")
        assert ui.live_notifications() == [(2, "boom")]
        t[0] = 9.0
        assert ui.live_notifications()      # still inside the 10 s window
        t[0] = 11.0
        assert ui.live_notifications() == []
    finally:
        ui.close()


def test_editor_app_log_view():
    from lumixengine_tpu.editor.app import EditorApp
    from lumixengine_tpu.engine.engine import Engine

    engine = Engine()
    world = engine.create_world(capacity=8)
    app = EditorApp(engine, world)
    app.handle_key(0, "1")
    assert app.view == "log"
    app.render_text(80, 12)               # first render subscribes the sink
    core_log.log_warning("test", "hello from the log view")
    txt = app.render_text(80, 12)
    assert "hello from the log view" in txt
    app.handle_key(27)
    assert app.view == "main"
    app.log_ui().close()
