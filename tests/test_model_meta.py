"""Model import meta (importers/model_meta.py ≙ reference
renderer/editor/model_meta.h): the `.meta` sidecar's physics/origin/scale/
culling/LOD settings parse from the reference's own files, round-trip
through our writer, bake into imported models, and drive the AssetCompiler
plugin (meta edits recompile)."""
import os
import shutil

import numpy as np
import pytest

from lumixengine_tpu.importers import model_meta as MM

SNAKE = "/root/reference/demo/models/snake/Snake.fbx"
YBOT_META = "/root/reference/demo/models/ybot/ybot.fbx.meta"


def test_parse_reference_meta_files():
    m = MM.load_meta_for(SNAKE)
    assert m.scene_scale == 0.5
    assert m.physics == "none" and m.culling_scale == 1.0
    if not os.path.exists(YBOT_META):
        pytest.skip("ybot meta missing")
    with open(YBOT_META) as f:
        y = MM.parse_meta(f.read())
    assert y.lod_count == 4
    np.testing.assert_allclose(y.lods_distances[:3], [20.0, 50.0, 150.0])


def test_meta_round_trip():
    m = MM.ModelMeta(physics="convex", origin="bottom", scene_scale=2.5,
                     culling_scale=1.2, lod_count=2)
    m.lods_distances[0] = 15.0
    m.lods_distances[1] = 60.0
    back = MM.parse_meta(m.serialize())
    assert back.physics == "convex" and back.origin == "bottom"
    assert back.scene_scale == 2.5 and back.culling_scale == 1.2
    assert back.lod_count == 2
    np.testing.assert_allclose(back.lods_distances[:2], [15.0, 60.0])


def test_apply_meta_scale_origin_lods():
    from lumixengine_tpu.renderer.model import Model

    vp = np.array([[0, 1, 0], [2, 3, 0], [-2, 2, 4]], np.float32)
    mdl = Model(name="m", vertex_positions=vp.copy(),
                vertex_triangles=np.array([[0, 1, 2]], np.int32),
                bounding_radius=1.0)
    meta = MM.ModelMeta(scene_scale=2.0, origin="bottom",
                        culling_scale=1.5, lod_count=2)
    meta.lods_distances[0] = 10.0
    MM.apply_meta(mdl, meta)
    out = np.asarray(mdl.vertex_positions)
    # scaled then rebased: min y = 0, centered in xz
    assert abs(out[:, 1].min()) < 1e-6
    mn, mx = out.min(0), out.max(0)
    np.testing.assert_allclose(mn[[0, 2]], -mx[[0, 2]], atol=1e-5)
    # extents doubled by scale
    assert abs((mx[0] - mn[0]) - 8.0) < 1e-5
    # culling radius includes culling_scale
    r = np.linalg.norm(out, axis=1).max()
    assert abs(mdl.bounding_radius - r * 1.5) < 1e-4
    # lods: set distance then inf padding
    assert mdl.lod_distances[0] == 10.0 and np.isinf(mdl.lod_distances[2])


def test_asset_compiler_fbx_plugin(tmp_path):
    from lumixengine_tpu.editor.asset_compiler import AssetCompiler

    if not os.path.exists(SNAKE):
        pytest.skip("reference snake asset missing")
    fbx_path = str(tmp_path / "snake.fbx")
    shutil.copy(SNAKE, fbx_path)
    with open(fbx_path + ".meta", "w") as f:
        f.write('physics = "convex"\nscale = 0.5\nlod_count = 1\n'
                'lod0_distance = 40\n')
    compiler = AssetCompiler()
    MM.register(compiler)
    out = compiler.compile(fbx_path)
    mdl = out["model"]
    assert out["meta"].scene_scale == 0.5
    assert mdl.lod_distances[0] == 40.0
    kind, hull = out["physics"]
    assert kind == "convex" and hull is not None
    assert hull.verts.shape[1] == 3 and len(hull.verts) >= 4
    v0 = compiler.version(fbx_path)
    # meta edit → recompile through the watch channel
    with open(fbx_path + ".meta", "w") as f:
        f.write('scale = 1.0\nlod_count = 1\n')
    compiler.on_file_changed(fbx_path + ".meta")
    assert compiler.version(fbx_path) == v0 + 1
    out2 = compiler.get(fbx_path)
    assert out2["meta"].scene_scale == 1.0 and out2["physics"] is None
    # scale halved → extents doubled vs the 0.5 import
    e1 = np.ptp(np.asarray(mdl.vertex_positions), axis=0)
    e2 = np.ptp(np.asarray(out2["model"].vertex_positions), axis=0)
    np.testing.assert_allclose(e2, e1 * 2.0, rtol=1e-4)


def test_snake_import_scaled_half():
    from lumixengine_tpu.importers import fbx

    if not os.path.exists(SNAKE):
        pytest.skip("reference snake asset missing")
    doc = fbx.load_fbx(SNAKE)
    raw = fbx.to_model(doc, name="snake")
    ext_raw = np.ptp(np.asarray(raw.vertex_positions), axis=0)
    scaled = fbx.to_model(doc, name="snake2")
    MM.apply_meta(scaled, MM.load_meta_for(SNAKE))
    ext = np.ptp(np.asarray(scaled.vertex_positions), axis=0)
    np.testing.assert_allclose(ext, ext_raw * 0.5, rtol=1e-5)
