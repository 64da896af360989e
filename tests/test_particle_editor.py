"""Particle script editor (≙ reference renderer/editor particle editor over
the .pat compiler; closes another SURVEY §2.3 renderer/editor sub-row)."""
import os

import pytest

REF_PAT = "/root/reference/demo/maps/particles/fireworks.pat"
_UP, _DOWN, _ENTER = 0x26, 0x28, 13

SIMPLE = """emitter test {
\tmax_particles 64
\tinit_emit_count 8
\tvar life : float
\tfn emit() {
\t\tlife = 1.0;
\t}
\tfn update() {
\t\tlife = life - time_delta;
\t\tif life < 0 { kill(); }
\t}
}
"""


def _editor(tmp_path, source=SIMPLE):
    from lumixengine_tpu.editor.particle_editor import ParticleEditor

    p = tmp_path / "test.pat"
    p.write_text(source)
    return ParticleEditor(str(p))


def test_compiles_and_previews_simple_script(tmp_path):
    ed = _editor(tmp_path)
    assert ed.error is None, ed.error
    assert "test" in ed.emitters
    ed.step_preview(frames=10)
    hist = ed.history["test"]
    assert len(hist) == 10 and hist[0] >= 8      # init_emit_count spawned
    scr = ed.render_text(100, 24)
    assert "emitter test" in scr and "alive" in scr


def test_line_edit_recompiles_and_error_shown(tmp_path):
    ed = _editor(tmp_path)
    # break line 2 (max_particles) through the key machine
    ed.handle_key(_DOWN)
    ed.handle_key(_ENTER)
    ed.edit = "\tmax_particles oops"
    ed.handle_key(_ENTER)
    assert ed.error is not None
    assert "COMPILE ERROR" in ed.render_text(100, 24)
    # fix it again
    ed.handle_key(_ENTER)
    ed.edit = "\tmax_particles 32"
    ed.handle_key(_ENTER)
    assert ed.error is None


def test_save_roundtrip(tmp_path):
    ed = _editor(tmp_path)
    ed.handle_key(_DOWN)
    ed.handle_key(_ENTER)
    ed.edit = "\tmax_particles 128"
    ed.handle_key(_ENTER)
    ed.handle_key(0, "s")
    from lumixengine_tpu.editor.particle_editor import ParticleEditor

    ed2 = ParticleEditor(ed.path)
    assert ed2.error is None
    assert ed2.emitters["test"].decl.max_particles == 128


@pytest.mark.skipif(not os.path.exists(REF_PAT),
                    reason="reference fireworks.pat not present")
def test_reference_fireworks_compiles_and_previews():
    from lumixengine_tpu.editor.particle_editor import ParticleEditor

    ed = ParticleEditor(REF_PAT)
    assert ed.error is None, ed.error
    ed.step_preview(frames=15)
    assert ed.history and any(any(v > 0 for v in h)
                              for h in ed.history.values())


def test_editor_app_particles_view(tmp_path):
    from lumixengine_tpu.editor.app import EditorApp
    from lumixengine_tpu.models.demo_scenes import build_engine

    engine, renderer = build_engine(model_instances=8)
    world = engine.create_world(capacity=16)
    app = EditorApp(engine, world)
    p = tmp_path / "mini.pat"
    p.write_text(SIMPLE)
    app.particle_editor(str(p))              # preload explicit script
    app.handle_key(0, "6")
    assert app.view == "particles"
    assert "particle editor" in app.render_text(100, 28)
    app.handle_key(27)
    assert app.view == "main"
