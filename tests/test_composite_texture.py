"""Composite texture graphs (importers/composite_texture.py ≙ reference
renderer/editor/composite_texture.cpp): the byte-compatible .ltc reader
parses every composite asset the demo ships, and the baker evaluates them
to texture layers (noise kernels replicate the reference's exact integer
hashes)."""
import os

import numpy as np
import pytest

from lumixengine_tpu.importers import composite_texture as CT

DEMO = "/root/reference/demo"
LTCS = [f"{DEMO}/textures/water_h.ltc",
        f"{DEMO}/maps/terrain_test/albedo_detail.ltc",
        f"{DEMO}/maps/terrain_test/normal_detail.ltc",
        f"{DEMO}/maps/particles/explosion.ltc"]


def _loader(path):
    """Tiny texture loader for INPUT nodes: engine/textures/*.tga."""
    from lumixengine_tpu.renderer.texture import load_tga

    full = os.path.join("/root/reference/data", path)
    if not os.path.exists(full):
        full = os.path.join(DEMO, path)
    if not os.path.exists(full):
        # solid fallback by name (red.tga/green.tga are 4x4 solids)
        c = {"red": (1, 0, 0), "green": (0, 1, 0)}.get(
            os.path.basename(path).split(".")[0], (0.5, 0.5, 1.0))
        img = np.zeros((4, 4, 4), np.float32)
        img[..., :3] = c
        img[..., 3] = 1.0
        return img
    data = load_tga(open(full, "rb").read())
    return np.asarray(data, np.float32) / 255.0


def test_parses_every_demo_ltc():
    for p in LTCS:
        if not os.path.exists(p):
            pytest.skip("demo assets missing")
        g = CT.parse_ltc(open(p, "rb").read())
        assert any(n.type == "OUTPUT" for n in g.nodes)
        assert g.links


def test_terrain_albedo_array_bakes_two_layers():
    p = LTCS[1]
    if not os.path.exists(p):
        pytest.skip("demo assets missing")
    g = CT.parse_ltc(open(p, "rb").read())
    out = [n for n in g.nodes if n.type == "OUTPUT"][0]
    assert out.props["layers"] == 2 and out.props["output_type"] == 1
    layers = CT.CompositeTextureBaker(g, load_texture=_loader).bake()
    assert len(layers) == 2
    for lay in layers:
        assert lay.ndim == 3 and lay.shape[-1] == 4
    # red.tga layer is red-dominant, green.tga layer green-dominant
    assert layers[0][..., 0].mean() > layers[0][..., 1].mean()
    assert layers[1][..., 1].mean() > layers[1][..., 0].mean()


def test_water_height_bakes_gradient_noise():
    p = LTCS[0]
    if not os.path.exists(p):
        pytest.skip("demo assets missing")
    g = CT.parse_ltc(open(p, "rb").read())
    layers = CT.CompositeTextureBaker(g).bake()
    assert len(layers) == 1
    lay = layers[0]
    assert lay.shape == (512, 512, 4)
    v = lay[..., 0]
    # gradient noise: zero-mean-ish field in [0,1], spatially varying,
    # tileable at the scale period (exact integer-hash kernel)
    assert 0.35 < v.mean() < 0.65
    assert v.std() > 0.05
    assert abs(float(v[0].mean()) - float(v[-1].mean())) < 0.2


def test_explosion_bakes_radial_alpha():
    p = LTCS[3]
    if not os.path.exists(p):
        pytest.skip("demo assets missing")
    g = CT.parse_ltc(open(p, "rb").read())
    layers = CT.CompositeTextureBaker(g).bake()
    lay = layers[0]
    assert lay.shape[-1] == 4
    h, w = lay.shape[:2]
    # white sprite whose ALPHA is the inverted radial falloff: opaque core,
    # transparent corners
    assert lay[h // 2, w // 2, 3] > 0.9
    assert lay[2, 2, 3] < 0.2
    assert lay[h // 2, w // 2, 0] > 0.9


def test_gradient_noise_matches_reference_hash():
    """The integer hash chain is bit-exact: spot-check ihash1D against
    values computed by hand from the published constants."""
    q = np.array([0, 1, 2, 123456], np.uint32)
    h = CT._ihash1d(q)
    # ihash1D(0): q=2891336453; q=(q<<13)^q; q*(q*q*15731+789221)+1376312589
    def ref(x):
        x = np.uint32(x * 747796405 + 2891336453)
        x = np.uint32((np.uint32(x << np.uint32(13))) ^ x)
        return np.uint32(x * np.uint32(x * x * np.uint32(15731)
                                       + np.uint32(789221))
                         + np.uint32(1376312589))
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = [ref(np.uint32(v)) for v in [0, 1, 2, 123456]]
    assert (h == np.array(exp, np.uint32)).all()


def test_asset_compiler_plugin_bakes_ltc(tmp_path):
    from lumixengine_tpu.editor.asset_compiler import AssetCompiler

    p = LTCS[0]
    if not os.path.exists(p):
        pytest.skip("demo assets missing")
    import shutil
    dst = str(tmp_path / "water.ltc")
    shutil.copy(p, dst)
    compiler = AssetCompiler()
    CT.register(compiler)
    out = compiler.compile(dst)
    assert out["layers"][0].dtype == np.uint8
    assert out["layers"][0].shape == (512, 512, 4)
