"""TPU-native present path (renderer/gpu_tpu.py ≙ gpu_dx12.cpp) — the
tile-binned on-device rasterizer must agree with the host reference
rasterizer (renderer/raster.py) on coverage, occlusion and shading, report
bin overflow honestly, and jit once per topology."""
import numpy as np

from lumixengine_tpu import app as app_mod
from lumixengine_tpu.renderer import gpu_tpu, raster


def _runner(num_entities=128):
    from lumixengine_tpu.models import demo_scenes

    engine, world, renderer = demo_scenes.headless_demo_world(
        num_entities=num_entities)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(2)
    return runner


def test_tpu_raster_matches_host_raster():
    runner = _runner()
    present = gpu_tpu.TpuPresent(width=240, height=136)
    rgb, depth, overflow = present(runner)
    rgb, depth = np.asarray(rgb), np.asarray(depth)
    assert rgb.shape == (136, 240, 3) and rgb.dtype == np.uint8
    assert int(overflow) == 0

    fb, zb = raster.rasterize_view(runner, width=240, height=136,
                                   max_instances=256)
    hit_t = depth < np.inf
    hit_h = zb[:136] < np.inf
    assert hit_t.mean() > 0.01                  # geometry hit the screen
    # coverage agreement with the host rasterizer (same projection, same
    # fill rule up to pixel-center edge cases)
    agree = (hit_t == hit_h).mean()
    assert agree > 0.97, agree
    # where both hit, depth matches (same perspective-correct interp)
    both = hit_t & hit_h
    assert both.any()
    dd = np.abs(depth[both] - zb[:136][both])
    rel = dd / np.maximum(zb[:136][both], 1e-3)
    assert np.median(rel) < 0.05
    # shading parity: same palette/Lambert — colors close where both hit
    diff = np.abs(rgb[both].astype(np.int32) - fb[:136][both].astype(np.int32))
    assert np.median(diff) <= 8


def test_tpu_raster_occlusion_and_background():
    """Two stacked octahedra: the nearer one wins the z-test; empty pixels
    keep the background (18,18,18)."""
    from lumixengine_tpu.models import demo_scenes

    engine, world, renderer = demo_scenes.headless_demo_world(num_entities=8)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    present = gpu_tpu.TpuPresent(width=96, height=64)
    rgb, depth, overflow = present(runner)
    rgb, depth = np.asarray(rgb), np.asarray(depth)
    bg = depth == np.inf
    assert bg.any()
    assert (rgb[bg] == 18).all()
    hits = depth[depth < np.inf]
    if hits.size:
        assert (hits > 0).all()


def test_tpu_raster_rebakes_on_topology_change():
    runner = _runner(num_entities=32)
    present = gpu_tpu.TpuPresent(width=64, height=32)
    _ = present(runner)
    v0 = present._soup_version
    w = runner.world
    rmod = w.modules["renderer"]
    victim = int(rmod.model_instances.entity[0])
    w.destroy_entity(victim)
    runner.state = w.device_state()
    _ = present(runner)
    assert present._soup_version != v0
