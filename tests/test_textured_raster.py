"""Bake-time centroid texturing on BOTH present paths
(raster.model_triangle_colors ≙ material.cpp texture slot 0; TPU path stays
gather-free because colors bake into the static soup) and the FBX UV
extraction that feeds it (importers/fbx._geo_cp_uvs)."""
import glob
import os

import numpy as np
import pytest

from lumixengine_tpu import app as app_mod
from lumixengine_tpu.engine.engine import Engine
from lumixengine_tpu.renderer.material import Material, Texture
from lumixengine_tpu.renderer.model import Model
from lumixengine_tpu.renderer.raster import model_triangle_colors
from lumixengine_tpu.renderer.render_module import RendererSystem


def _two_quad_model():
    """Two coplanar quads: left one centered on the texture's RED half,
    right one on the BLUE half."""
    v = np.array([
        [-2.0, -1, 0], [-1.0, -1, 0], [-1.0, 1, 0], [-2.0, 1, 0],   # left
        [1.0, -1, 0], [2.0, -1, 0], [2.0, 1, 0], [1.0, 1, 0],       # right
    ], np.float32)
    uv = np.array([
        [0.1, 0.4], [0.3, 0.4], [0.3, 0.6], [0.1, 0.6],   # left → u<0.5
        [0.7, 0.4], [0.9, 0.4], [0.9, 0.6], [0.7, 0.6],   # right → u>0.5
    ], np.float32)
    t = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    return v, uv, t


def _textured_system():
    engine = Engine()
    rsys = RendererSystem(engine)
    # 8x8 texture: left half red, right half blue
    data = np.zeros((8, 8, 3), np.uint8)
    data[:, :4] = (255, 0, 0)
    data[:, 4:] = (0, 0, 255)
    rsys.materials.add_texture(Texture("halves.tga", data))
    mat = rsys.materials.add(Material(
        "halves", uniforms={"color_r": 1.0, "color_g": 1.0, "color_b": 1.0},
        textures={"slot0": "halves.tga"}))
    v, uv, t = _two_quad_model()
    mid = rsys.add_model(Model(name="quads", bounding_radius=3.0,
                               vertex_positions=v, vertex_uvs=uv,
                               vertex_triangles=t, material_id=mat))
    engine.add_system(rsys)
    return engine, rsys, mid


def test_triangle_colors_sample_texture_at_centroids():
    engine, rsys, mid = _textured_system()
    cols = model_triangle_colors(mid, rsys.models, rsys.materials)
    assert cols.shape == (4, 3)
    np.testing.assert_allclose(cols[0], [255, 0, 0])   # left quad = red
    np.testing.assert_allclose(cols[1], [255, 0, 0])
    np.testing.assert_allclose(cols[2], [0, 0, 255])   # right quad = blue
    np.testing.assert_allclose(cols[3], [0, 0, 255])
    # material color still modulates the texel
    rsys.materials.get(rsys.models.get(mid).material_id).uniforms[
        "color_r"] = 0.5
    cols = model_triangle_colors(mid, rsys.models, rsys.materials)
    np.testing.assert_allclose(cols[0], [127.5, 0, 0])


def test_both_presents_show_the_texture():
    from lumixengine_tpu.renderer import gpu_tpu

    engine, rsys, mid = _textured_system()
    world = engine.create_world(capacity=8)
    cam = world.create_entity(position=(0.0, 0.0, 5.0))
    world.create_component(cam, "camera", fov=np.pi / 3, near=0.1, far=50.0)
    e = world.create_entity()
    world.create_component(e, "model_instance", model=mid)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)

    # host present
    host = runner.present(width=96, height=64)
    # TPU-path present (CPU backend in tests; same jitted pipeline)
    tp = gpu_tpu.TpuPresent(width=96, height=64, lights=False)
    rgb, depth, overflow = tp(runner)
    rgb = np.asarray(rgb)
    assert int(overflow) == 0

    for img in (np.asarray(host), rgb):
        h, w = img.shape[:2]
        left = img[:, : w // 2].reshape(-1, 3).astype(np.float32)
        right = img[:, w // 2:].reshape(-1, 3).astype(np.float32)

        def red(p):
            return (p[:, 0] > 2 * p[:, 1] + 20) & (p[:, 0] > 2 * p[:, 2] + 20)

        def blue(p):
            return (p[:, 2] > 2 * p[:, 1] + 20) & (p[:, 2] > 2 * p[:, 0] + 20)

        # the left half of the screen shows the red quad, right the blue —
        # and never the other way around
        assert red(left).sum() > 20 and blue(right).sum() > 20
        assert blue(left).sum() == 0 and red(right).sum() == 0


@pytest.mark.skipif(
    not os.path.isfile("/root/reference/demo/models/demolevel/demolevel.fbx"),
    reason="reference demo assets not present")
def test_fbx_uv_extraction():
    from lumixengine_tpu.importers.fbx import load_fbx, to_model

    m = to_model(load_fbx(
        "/root/reference/demo/models/demolevel/demolevel.fbx"))
    assert m.vertex_uvs is not None
    assert m.vertex_uvs.shape == (len(m.vertex_positions), 2)
    # UVs are real data, not padding: finite with nontrivial spread
    assert np.isfinite(m.vertex_uvs).all()
    assert m.vertex_uvs.std() > 0.01
