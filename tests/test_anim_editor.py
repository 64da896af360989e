"""Animation controller graph editor (≙ reference
animation/editor/controller_editor.cpp node-graph editor; closes the
SURVEY §2.4 animation/editor row) + the .act writer it saves through."""
import os

import numpy as np
import pytest

YBOT_ACT = "/root/reference/demo/models/ybot/ybot.act"
_UP, _DOWN, _TAB, _ENTER = 0x26, 0x28, 9, 13


def _locomotion_editor():
    from lumixengine_tpu.models.demo_scenes import build_engine
    from lumixengine_tpu.editor.anim_editor import AnimGraphEditor

    engine, renderer, anim = build_engine(with_animation=True,
                                          model_instances=8, animators=8)
    return AnimGraphEditor(anim.controllers[0])


def test_act_writer_roundtrips_reference_byte_exact(tmp_path):
    if not os.path.exists(YBOT_ACT):
        pytest.skip("reference ybot.act not present")
    from lumixengine_tpu.importers.act import parse_act, write_act

    data = open(YBOT_ACT, "rb").read()
    p = parse_act(data)
    assert write_act(p) == data
    # a header edit (retargeted entry) re-serializes and re-parses cleanly
    p["entries"][0]["animation"] = "models/ybot/other.anm"
    p2 = parse_act(write_act(p))
    assert p2["entries"][0]["animation"] == "models/ybot/other.anm"
    assert p2["slots"] == p["slots"]
    assert p2["inputs"] == p["inputs"]
    assert p2["graph_blob"] == p["graph_blob"]


def test_graph_tree_and_preview_weights():
    ed = _locomotion_editor()
    rows = ed.tree_rows()
    labels = [r[1] for r in rows]
    assert any("Blend1D" in s for s in labels)
    assert sum("clip" in s for s in labels) == 3      # idle/walk/run leaves
    # preview at speed 0: idle fully weighted
    ed.step_preview()
    weights = {int(c): float(w) for c, _t, w, _p in ed._last_slots}
    assert weights.get(0, 0.0) > 0.99
    # nudge the speed input into the idle→walk ramp: weights split
    ed.handle_key(_TAB)                               # tree → inputs
    ed.handle_key(0, "+")                             # speed = 0.5
    ed.step_preview()
    weights = {int(c): float(w) for c, _t, w, _p in ed._last_slots}
    assert 0.05 < weights.get(1, 0.0) < 0.95
    assert abs(sum(weights.values()) - 1.0) < 1e-4    # partition of unity


def test_input_typing_and_pause():
    ed = _locomotion_editor()
    ed.handle_key(_TAB)                               # inputs column
    ed.handle_key(_ENTER)
    for ch in "2.5":
        ed.handle_key(0, ch)
    ed.handle_key(_ENTER)
    assert float(ed.inputs[0, 0]) == 2.5
    ed.handle_key(0, " ")                             # pause
    clocks = ed.clocks.copy()
    ed.step_preview()
    assert (ed.clocks == clocks).all()                # paused: no advance
    scr = ed.render_text(96, 24)
    assert "anim graph" in scr and "speed" in scr


def test_editor_app_view_switch():
    from lumixengine_tpu.editor.app import EditorApp
    from lumixengine_tpu.models.demo_scenes import build_engine

    engine, renderer, anim = build_engine(with_animation=True,
                                          model_instances=8, animators=8)
    world = engine.create_world(capacity=16)
    app = EditorApp(engine, world)
    app.handle_key(0, "5")
    assert app.view == "anim"
    scr = app.render_text(100, 28)
    assert "anim graph" in scr
    app.handle_key(27)                                # esc returns
    assert app.view == "main"


def test_retarget_entry_saves_act(tmp_path):
    if not os.path.exists(YBOT_ACT):
        pytest.skip("reference ybot.act not present")
    from lumixengine_tpu.importers.act import parse_act
    from lumixengine_tpu.editor.anim_editor import AnimGraphEditor

    ed = _locomotion_editor()
    ed.parsed = parse_act(open(YBOT_ACT, "rb").read())
    ed.act_path = str(tmp_path / "edited.act")
    ed.retarget_entry(0, "models/ybot/retargeted.anm")
    ed.handle_key(0, "s")
    assert os.path.exists(ed.act_path)
    p = parse_act(open(ed.act_path, "rb").read())
    assert p["entries"][0]["animation"] == "models/ybot/retargeted.anm"
