"""`.mat` importer (importers/mat.py ≙ material.cpp:137-216 serialize +
:455-540 load) and the material editor view (editor/material_editor.py ≙
render_plugins.cpp MaterialPlugin::EditorWindow:668-900)."""
import glob
import os
import shutil

import pytest

from lumixengine_tpu.importers.mat import parse_mat, to_material, write_mat

REF_MATS = sorted(glob.glob("/root/reference/demo/**/*.mat", recursive=True)
                  + glob.glob("/root/reference/data/**/*.mat",
                              recursive=True))
_UP, _DOWN, _ENTER = 0x26, 0x28, 13


@pytest.mark.skipif(not REF_MATS, reason="reference materials not present")
def test_parse_every_reference_material_and_roundtrip():
    assert len(REF_MATS) > 40
    for p in REF_MATS:
        with open(p, "r", errors="replace") as f:
            src = f.read()
        m = parse_mat(src)
        assert m.shader, p                      # every real .mat has one
        again = parse_mat(write_mat(m))
        assert again == m, p                    # writer is parse-stable


def test_parse_fields():
    m = parse_mat(
        'shader "/engine/shaders/particles.hlsl"\n'
        "backface_culling true\n"
        'layer "transparent"\n'
        'define "ALPHA_CUTOUT"\n'
        'custom_flag "require8bit"\n'
        'texture "particle.ltc"\n'
        'texture ""\n'
        'int_uniform "Frames cols", 2\n'
        'uniform "Material color", {1.000000,0.626000,0.385387,1}\n'
        'uniform "Roughness", 0.250000\n')
    assert m.shader.endswith("particles.hlsl")
    assert m.backface_culling and m.layer == "transparent"
    assert m.defines == ["ALPHA_CUTOUT"]
    assert m.custom_flags == ["require8bit"]
    assert m.textures == ["particle.ltc", ""]
    assert m.int_uniforms == {"Frames cols": 2}
    assert m.uniforms["Material color"] == (1.0, 0.626, 0.385387, 1.0)
    assert m.uniforms["Roughness"] == 0.25


def test_to_material_bridges_engine_slots():
    m = parse_mat('shader "/s.hlsl"\nlayer "transparent"\n'
                  'texture "a.tga"\n'
                  'uniform "Material color", { 0.2, 0.4, 0.6, 1.0 }\n'
                  'uniform "Roughness", 0.3\nuniform "Metallic", 0.9\n')
    mat = to_material("x", m)
    assert mat.alpha_blend and mat.layer == "transparent"
    assert mat.uniforms["color_r"] == pytest.approx(0.2)
    assert mat.uniforms["color_b"] == pytest.approx(0.6)
    assert mat.uniforms["roughness"] == pytest.approx(0.3)
    assert mat.uniforms["metallic"] == pytest.approx(0.9)
    assert mat.textures == {"slot0": "a.tga"}


@pytest.mark.skipif(not REF_MATS, reason="reference materials not present")
def test_material_editor_edit_undo_save(tmp_path):
    from lumixengine_tpu.editor.material_editor import MaterialEditor

    src = next(p for p in REF_MATS if "teeth" in p or "snake" in p)
    path = str(tmp_path / "m.mat")
    shutil.copy(src, path)
    ed = MaterialEditor(path)
    rows = ed.rows()
    assert rows[0][0] == "shader" and any(
        k.startswith("uniform:") for k, _, _ in rows)

    # toggle backface, then undo restores it
    bf0 = ed.mat.backface_culling
    ed.handle_key(0, "b")
    assert ed.mat.backface_culling is (not bf0) and ed.dirty
    ed.handle_key(0, "u")
    assert ed.mat.backface_culling is bf0

    # edit the Material color uniform through the key machine
    ed.sel = next(i for i, r in enumerate(ed.rows())
                  if r[0] == "uniform:Material color")
    ed.handle_key(_ENTER)
    for ch in "{ 0.5, 0.25, 0.125, 1 }":
        ed.handle_key(0, ch)
    ed.handle_key(_ENTER)
    assert ed.mat.uniforms["Material color"] == (0.5, 0.25, 0.125, 1.0)

    # a garbage edit is rejected, state unchanged
    ed.handle_key(_ENTER)
    for ch in "wat":
        ed.handle_key(0, ch)
    ed.handle_key(_ENTER)
    assert "bad value" in ed.status
    assert ed.mat.uniforms["Material color"] == (0.5, 0.25, 0.125, 1.0)

    # save → the file on disk parses back with the edit
    ed.handle_key(0, "s")
    assert not ed.dirty
    with open(path) as f:
        again = parse_mat(f.read())
    assert again.uniforms["Material color"] == (0.5, 0.25, 0.125, 1.0)

    txt = ed.render_text(100, 24)
    assert "material editor" in txt and "engine:" in txt


@pytest.mark.skipif(not os.path.isdir("/root/reference/demo"),
                    reason="reference demo assets not present")
def test_editor_app_material_view():
    from lumixengine_tpu.editor.app import EditorApp
    from lumixengine_tpu.models import demo_scenes

    engine, world, _ = demo_scenes.headless_demo_world(num_entities=32)
    app = EditorApp(engine, world)
    app.handle_key(0, "9")
    assert app.view == "material"
    txt = app.render_text(100, 24)
    assert "material editor" in txt
    # typing 'q' while editing a value must not quit (the edit-state guard)
    app.handle_key(13)
    app.handle_key(0, "q")
    assert not app.quit_requested
    assert app.material_editor().edit == "q"
    app.handle_key(27)                     # cancel edit
    app.handle_key(27)                     # back to main
    assert app.view == "main"
