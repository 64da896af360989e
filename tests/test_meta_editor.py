"""Model-import meta editor (editor/meta_editor.py ≙ reference
renderer/editor/model_importer.cpp import UI + model_meta.h): edit the
.meta sidecar fields, save, recompile through the AssetCompiler."""
import os
import shutil

import numpy as np
import pytest

REF_FBX = "/root/reference/demo/models/demolevel/demolevel.fbx"
_ENTER, _DOWN = 13, 0x28


@pytest.mark.skipif(not os.path.isfile(REF_FBX),
                    reason="reference demo assets not present")
def test_meta_editor_edit_save_recompile(tmp_path):
    from lumixengine_tpu.editor.asset_compiler import AssetCompiler
    from lumixengine_tpu.editor.meta_editor import MetaEditor
    from lumixengine_tpu.importers import model_meta as MM

    path = str(tmp_path / "level.fbx")
    shutil.copy(REF_FBX, path)
    compiler = AssetCompiler()
    MM.register(compiler)

    ed = MetaEditor(path, compiler=compiler)
    assert ed.meta.physics == "none"            # defaults, no sidecar yet

    # physics cycles none → convex on enter (combo semantics)
    ed.sel = [k for k, _ in ed.rows()].index("physics")
    ed.handle_key(_ENTER)
    assert ed.meta.physics == "convex" and ed.dirty

    # typed scale edit
    ed.sel = [k for k, _ in ed.rows()].index("scale")
    ed.handle_key(_ENTER)
    for ch in "2.5":
        ed.handle_key(0, ch)
    ed.handle_key(_ENTER)
    assert ed.meta.scene_scale == 2.5

    # save writes the sidecar and recompiles with it honored
    ed.handle_key(0, "s")
    assert "saved" in ed.status and "recompiled" in ed.status
    meta = MM.load_meta_for(path)
    assert meta.physics == "convex" and meta.scene_scale == 2.5
    out = compiler.compile(path)
    assert out["meta"].scene_scale == 2.5
    assert out["physics"] is not None and out["physics"][0] == "convex"

    txt = ed.render_text(80, 20)
    assert "model meta" in txt and "scale = 2.5" in txt


@pytest.mark.skipif(not os.path.isfile(REF_FBX),
                    reason="reference demo assets not present")
def test_asset_browser_opens_meta_editor(tmp_path):
    from lumixengine_tpu.editor.app import EditorApp
    from lumixengine_tpu.models import demo_scenes

    engine, world, _ = demo_scenes.headless_demo_world(num_entities=32)
    app = EditorApp(engine, world,
                    settings_path=str(tmp_path / "e.ini"))
    app.handle_key(0, "2")
    ab = app.asset_browser()
    ab.filter = "demolevel.fbx"
    ab.sel = 0
    app.handle_key(0, "@")
    assert app.view == "meta"
    assert app.meta_editor().asset_path.endswith("demolevel.fbx")
    assert "model meta" in app.render_text(80, 20)
    # 'q' while typing a value must not quit (edit-state guard)
    app.meta_editor().sel = [k for k, _ in
                             app.meta_editor().rows()].index("scale")
    app.handle_key(13)
    app.handle_key(0, "q")
    assert not app.quit_requested
    app.handle_key(27)
    app.handle_key(27)
    assert app.view == "main"
