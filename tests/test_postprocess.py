"""Post-process passes + software gpu backend (≙ the reference's builtin
RenderPlugins, renderer.cpp:444-470, and DrawStream::run against the gpu
backend, gpu_dx12.cpp — here jitted JAX image kernels replayed by
gpu_soft.SoftwareGpuBackend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumixengine_tpu.renderer import postprocess as pp


def _flat_depth(h=32, w=48, d=5.0):
    return jnp.full((h, w), d)


def test_tonemap_range_and_monotonicity():
    x = jnp.stack([jnp.zeros((4, 4, 3)), jnp.full((4, 4, 3), 0.5),
                   jnp.full((4, 4, 3), 8.0)])
    y = pp.tonemap_aces(x, 1.0)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
    assert float(y[0].max()) == 0.0
    assert float(y[1].mean()) < float(y[2].mean())  # monotonic
    assert float(y[2].mean()) > 0.9                 # bright → near white


def test_bloom_spreads_bright_energy():
    c = jnp.zeros((32, 32, 3)).at[16, 16].set(8.0)
    out = pp.bloom(c, threshold=1.0, intensity=1.0)
    # neighbors that were black now carry bloom energy
    assert float(out[16, 12].sum()) > 0.001
    assert float(out[12, 16].sum()) > 0.001
    # dark scene below threshold gains nothing
    dark = jnp.full((32, 32, 3), 0.2)
    out2 = pp.bloom(dark, threshold=1.0, intensity=1.0)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(dark), atol=1e-5)


def test_ssao_flat_plane_unoccluded_corner_darkens():
    fov, aspect = np.radians(70.0), 1.5
    flat = pp.ssao(_flat_depth(), fov, aspect, radius=0.8, strength=1.0)
    assert float(flat.min()) > 0.9          # flat wall: no occlusion
    # a near column in front of a far wall occludes adjacent far pixels
    d = np.full((32, 48), 6.0, np.float32)
    d[:, 20:24] = 3.0
    ao = pp.ssao(jnp.asarray(d), fov, aspect, radius=1.2, strength=2.0)
    edge = np.asarray(ao[:, 24:28])
    far_away = np.asarray(ao[:, 40:])
    assert edge.min() < far_away.min() - 0.02   # darkened at the step edge


def test_sss_contact_shadow_marks_blocked_pixels():
    fov, aspect = np.radians(70.0), 1.5
    d = np.full((32, 48), 6.0, np.float32)
    d[:, :16] = 2.0                          # near slab on the -x side
    # sun shining from -x in view space: rays toward the slab
    lit = pp.sss_shadow(jnp.asarray(d), fov, aspect,
                        jnp.asarray([-1.0, 0.2, 0.0]), steps=8,
                        max_dist=4.0, shadow=0.4)
    lit = np.asarray(lit)
    assert lit.min() == pytest.approx(0.4)   # some pixels shadowed
    assert lit.max() == 1.0                  # others lit
    # shadowed region hugs the occluder side
    assert lit[:, 16:24].mean() < lit[:, 40:].mean()


@pytest.mark.slow  # 11 s
def test_tdao_darkens_under_overhang():
    # one instance sphere high above the origin
    hm = pp.tdao_heightmap(jnp.asarray([[0.0, 5.0, 0.0]]),
                           jnp.asarray([1.0]),
                           jnp.asarray([-8.0, -8.0]),
                           jnp.asarray([1 / 16.0, 1 / 16.0]), grid=32)
    assert float(hm.max()) == pytest.approx(6.0)
    fov, aspect = np.radians(70.0), 1.5
    depth = _flat_depth(24, 36, 4.0)
    cam_pos = jnp.asarray([0.0, 1.0, 4.0])   # looking -z at ground near origin
    cam_rot = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    ao = pp.tdao(depth, hm, cam_pos, cam_rot, fov, aspect,
                 jnp.asarray([-8.0, -8.0]), jnp.asarray([1 / 16.0, 1 / 16.0]),
                 strength=1.0)
    ao = np.asarray(ao)
    assert ao.min() < 0.75                   # under the sphere: occluded
    assert ao.max() > 0.95                   # away from it: open sky


def test_atmo_fills_sky_and_fogs_distance():
    h, w = 24, 36
    color = jnp.full((h, w, 3), 0.25)
    depth = jnp.full((h, w), jnp.inf).at[12:, :].set(10.0)
    rays = pp.world_rays(jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                         np.radians(70.0), w / h, h, w)
    out = np.asarray(pp.atmo(color, depth, rays, jnp.asarray([0.3, 0.8, 0.2]),
                             far=500.0))
    sky = out[:12]
    geo = out[12:]
    assert abs(sky - 0.25).max() > 0.05      # sky replaced the clear color
    assert sky[:4, :, 2].mean() > sky[:4, :, 0].mean()   # blue up top
    np.testing.assert_allclose(geo, 0.25, atol=0.12)     # near geometry ~kept


def test_cubemap_sky_samples_faces():
    h, w = 16, 24
    faces = jnp.zeros((6, 8, 8, 3)).at[4].set(
        jnp.asarray([1.0, 0.0, 0.0]))        # +Z face pure red
    color = jnp.zeros((h, w, 3))
    depth = jnp.full((h, w), jnp.inf)
    # camera facing +Z: rotate 180° about Y → rays hit the +Z face
    rays = pp.world_rays(jnp.asarray([0.0, 1.0, 0.0, 0.0]),
                         np.radians(70.0), w / h, h, w)
    out = np.asarray(pp.cubemap_sky(color, depth, rays, faces, far=500.0))
    assert out[h // 2, w // 2, 0] == pytest.approx(1.0)  # center: red face
    assert out[h // 2, w // 2, 1] == pytest.approx(0.0)


def test_dof_blurs_out_of_focus_only():
    c = jnp.zeros((32, 32, 3)).at[8, 8].set(4.0).at[24, 24].set(4.0)
    d = jnp.full((32, 32), 50.0).at[:16, :].set(10.0)  # top half in focus
    out = np.asarray(pp.dof(c, d, focus_dist=10.0, focus_range=15.0))
    assert out[8, 8].sum() == pytest.approx(12.0, rel=0.05)   # sharp
    assert out[24, 24].sum() < 8.0                             # blurred down
    assert out[24, 20].sum() > 0.0005                          # energy spread


def test_taa_converges_and_clamps():
    key = jax.random.PRNGKey(0)
    target = jax.random.uniform(key, (16, 16, 3))
    hist = jnp.zeros((16, 16, 3))
    for _ in range(30):
        hist = pp.taa(target, hist, alpha=0.3)
    np.testing.assert_allclose(np.asarray(hist), np.asarray(target), atol=0.02)
    # clamp: stale bright history collapses to the neighborhood immediately
    stale = jnp.full((16, 16, 3), 10.0)
    out = pp.taa(target, stale, alpha=0.1)
    assert float(out.max()) <= float(target.max()) + 1e-5


def test_film_grain_preserves_mean_adds_variance():
    c = jnp.full((64, 64, 3), 0.5)
    out = pp.film_grain(c, jax.random.PRNGKey(3), amount=0.2)
    assert float(jnp.abs(out.mean() - 0.5)) < 0.01
    assert float(out.std()) > 0.01


def test_fsr_upscale_shape_and_local_bounds():
    c = jax.random.uniform(jax.random.PRNGKey(1), (20, 30, 3))
    out = pp.fsr_upscale(c, 30, 45, sharpness=0.5)
    assert out.shape == (30, 45, 3)
    assert float(out.min()) >= 0.0 - 1e-6
    assert float(out.max()) <= float(c.max()) + 1e-5  # neighborhood clamp


@pytest.mark.slow  # 17 s: per-plugin coverage stays fast; the full-stream replay is integration
def test_backend_replays_full_stream_with_builtin_plugins(tmp_path):
    """End-to-end: demo scene → record_frame with the reference's builtin
    plugin set → software backend replay → presented PNG."""
    from lumixengine_tpu import app as app_mod
    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.renderer import gpu_soft, plugins

    engine, world, renderer = demo_scenes.headless_demo_world(num_entities=96)
    installed = plugins.install_builtins(renderer)
    assert len(installed) == len(plugins.DEFAULT_PLUGINS)
    if "gui" in world.modules:        # cover the glyph-blit path of draw_2d
        label = world.create_entity(name="hud")
        world.create_component(label, "gui_rect",
                               anchor=(0, 0, 0, 0), offset=(4, 4, 150, 28))
        world.create_component(label, "gui_text", text="FPS 60",
                               font_size=16)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(2)
    img, be = gpu_soft.render_frame(runner, str(tmp_path / "frame.png"),
                                    width=160, height=90, max_instances=128)
    assert img.shape == (90, 160, 3) and img.dtype == np.uint8
    assert be.draw_calls >= 2                       # instances + particles/2d
    assert img.std() > 4.0                          # a real, shaded image
    assert (tmp_path / "frame.png").exists()
    # TAA history carries to the next frame through the returned backend
    runner.run(1)
    img2, be2 = gpu_soft.render_frame(runner, None, width=160, height=90,
                                      backend=be, max_instances=128)
    assert be2.history is not None


def test_backend_draws_terrain_heightfield():
    """OP_DRAW_TERRAIN replays as a coarse heightfield mesh raster."""
    from lumixengine_tpu import app as app_mod
    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.renderer import gpu_soft

    engine, renderer = demo_scenes.build_engine(model_instances=16)
    world = engine.create_world(capacity=16)
    cam = world.create_entity(position=(0.0, 5.0, 40.0), name="camera")
    world.create_component(cam, "camera", fov=np.radians(70.0),
                           near=0.3, far=500.0)
    rng = np.random.default_rng(0)
    tid = renderer.terrains.add(rng.uniform(0, 1, (65, 65)),
                                xz_scale=1.0, y_scale=6.0,
                                grass_types=[{"density": 1.0,
                                              "height": 1.5}])
    t = world.create_entity(position=(-32.0, -4.0, -20.0), name="terrain")
    world.create_component(t, "terrain", terrain=tid)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    be = gpu_soft.SoftwareGpuBackend(runner, width=160, height=90,
                                     max_instances=16)
    be.draw_terrain(entity=t, terrain=tid)
    hit = (be.zb < np.inf).mean()
    assert hit > 0.2, hit                 # the hills fill a chunk of the view
    # grass blades drew on top of the heightfield (green != terrain base)
    grass_px = ((np.abs(be.fb[..., 1] - 168.0) < 40)
                & (np.abs(be.fb[..., 0] - 96.0) < 40)).mean()
    assert grass_px > 0.001, grass_px
    # and it rides the recorded stream end-to-end
    img, be2 = gpu_soft.render_frame(runner, None, width=160, height=90,
                                     max_instances=16)
    assert be2.draw_calls >= 3            # instances + terrain + 2d


def test_native_raster_matches_numpy_loop():
    """csrc/soft_raster.cpp is an exact mirror of raster.py's numpy fill —
    same pixels, same depths."""
    from lumixengine_tpu.renderer import raster
    from lumixengine_tpu.utils import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    verts = (rng.uniform(-5, 5, (300, 3)) + [0, 0, -10]).astype(np.float32)
    tris = rng.integers(0, 300, (200, 3)).astype(np.int32)
    cam_pos = np.zeros(3, np.float32)
    cam_rot = np.array([0, 0, 0, 1], np.float32)
    col = np.array([200, 100, 50], np.float32)

    def draw():
        fb = np.full((135, 240, 3), 18.0, np.float32)
        zb = np.full((135, 240), np.inf, np.float32)
        raster.raster_mesh(fb, zb, verts, tris, col, cam_pos, cam_rot,
                           1.2, 240, 135)
        return fb, zb

    fb_n, zb_n = draw()
    orig = native.available
    native.available = lambda: False
    try:
        fb_p, zb_p = draw()
    finally:
        native.available = orig
    assert (zb_n < np.inf).mean() > 0.3          # scene actually fills pixels
    np.testing.assert_array_equal(fb_n, fb_p)
    # numpy interpolates depth in f64, the kernel in f32 — ~1e-6 rounding
    np.testing.assert_allclose(
        np.where(np.isfinite(zb_n), zb_n, -1.0),
        np.where(np.isfinite(zb_p), zb_p, -1.0), rtol=1e-4)


def test_backend_draws_procedural_geometry():
    from lumixengine_tpu import app as app_mod
    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.renderer import gpu_soft

    engine, renderer = demo_scenes.build_engine(model_instances=8)
    world = engine.create_world(capacity=8)
    cam = world.create_entity(position=(0.0, 0.0, 10.0), name="camera")
    world.create_component(cam, "camera", fov=np.radians(70.0),
                           near=0.3, far=500.0)
    e = world.create_entity(position=(0.0, 0.0, 0.0))
    tri = np.array([[-3, -3, 0], [3, -3, 0], [0, 3, 0]], np.float32)
    world.create_component(e, "procedural_geometry", vertices=tri)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    img, be = gpu_soft.render_frame(runner, None, width=120, height=68,
                                    max_instances=8)
    assert (be.zb < np.inf).mean() > 0.05      # the triangle fills pixels


def test_host_dqs_matches_device_skinning():
    """gpu_soft.skin_points_dq_np == ops/skinning blend+skin (the backend's
    posed-mesh raster uses the same math as the engine's device path)."""
    from lumixengine_tpu.ops import skinning
    from lumixengine_tpu.renderer.gpu_soft import skin_points_dq_np

    rng = np.random.default_rng(5)
    B, V = 6, 40
    # random rigid dual quats: real = unit quat, dual = 0.5 * t ⊗ real
    real = rng.normal(size=(B, 4))
    real /= np.linalg.norm(real, axis=-1, keepdims=True)
    trans = rng.uniform(-2, 2, (B, 3))
    tq = np.concatenate([trans, np.zeros((B, 1))], -1)
    from lumixengine_tpu.core import host_math as hm
    dual = 0.5 * hm.quat_mul(tq, real)
    pal = np.concatenate([real, dual], -1).T.astype(np.float32)  # [8, B]

    bones4 = rng.integers(0, B, (V, 4)).astype(np.int32)
    w = rng.uniform(0, 1, (V, 4)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    pts = rng.uniform(-1, 1, (V, 3)).astype(np.float32)

    host = skin_points_dq_np(pal, pts, bones4, w)

    wbv = skinning.weights_matrix(bones4, w, B)              # [B, V]
    blended = skinning.blend_palette(jnp.asarray(pal)[..., None], wbv)
    dev = skinning.skin_points(blended, jnp.asarray(pts.T))
    np.testing.assert_allclose(host, np.asarray(dev)[..., 0].T,
                               atol=2e-3)


def test_host_dqs_identity_and_translation():
    from lumixengine_tpu.renderer.gpu_soft import skin_points_dq_np

    pal = np.zeros((8, 2), np.float32)
    pal[3] = 1.0                                     # identity reals
    pal[6, 1] = 1.0                                  # bone 1: dual=(0,0,1,0) → +2z
    pts = np.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    bones4 = np.array([[0, 0, 0, 0], [1, 0, 0, 0], [0, 1, 0, 0]], np.int32)
    w = np.array([[1, 0, 0, 0], [1.0, 0, 0, 0], [0.5, 0.5, 0, 0]], np.float32)
    out = skin_points_dq_np(pal, pts, bones4, w)
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)      # bone 0 rest
    np.testing.assert_allclose(out[1], [0, 1, 2], atol=1e-6)      # +2z
    np.testing.assert_allclose(out[2], [0, 0, 2], atol=1e-3)      # halfway


def test_decal_pass_tints_inside_obb_only():
    fov, aspect = np.radians(70.0), 1.5
    color = jnp.full((24, 36, 3), 0.3)
    depth = jnp.full((24, 36), 5.0)            # flat wall 5m ahead
    cam_pos = jnp.zeros(3)
    cam_rot = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    # decal box centered where the camera looks (0, 0, -5)
    out = np.asarray(pp.decal_pass(
        color, depth, fov, aspect, cam_pos, cam_rot,
        jnp.asarray([[0.0, 0.0, -5.0]]), jnp.asarray([[0.0, 0, 0, 1.0]]),
        jnp.asarray([[1.0, 1.0, 0.5]]), jnp.asarray([[1.0, 0.0, 0.0]])))
    c = out[12, 18]
    assert c[0] > 0.6 and c[1] < 0.2           # center tinted red
    np.testing.assert_allclose(out[0, 0], 0.3, atol=1e-5)   # corner untouched


def test_decal_draws_through_backend():
    from lumixengine_tpu import app as app_mod
    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.renderer import gpu_soft

    engine, renderer = demo_scenes.build_engine(model_instances=16)
    world = engine.create_world(capacity=16)
    cam = world.create_entity(position=(0.0, 0.0, 10.0), name="camera")
    world.create_component(cam, "camera", fov=np.radians(70.0))
    wall = world.create_entity(position=(0.0, 0.0, 0.0), scale=(4.0,) * 3)
    world.create_component(wall, "model_instance", model="cube")
    dec = world.create_entity(position=(0.0, 0.0, 2.5))
    world.create_component(dec, "decal", material=3,
                           half_extents=(1.0, 1.0, 2.0))
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    img, be = gpu_soft.render_frame(runner, None, width=120, height=68,
                                    max_instances=16)
    # compare against the same frame without the decal
    world.destroy_component(dec, "decal")
    img2, _ = gpu_soft.render_frame(runner, None, width=120, height=68,
                                    max_instances=16)
    assert np.abs(img.astype(int) - img2.astype(int)).max() > 20
    # curve decal: bezier-sampled OBB segments ride the same pass
    cd = world.create_entity(position=(0.0, 0.0, 2.5))
    world.create_component(cd, "curve_decal", material=6,
                           half_extents=(0.6, 1.0, 0.6),
                           bezier_p0=(-2.0, 0.0), bezier_p2=(2.0, 0.0))
    img3, _ = gpu_soft.render_frame(runner, None, width=120, height=68,
                                    max_instances=16)
    assert np.abs(img3.astype(int) - img2.astype(int)).max() > 20


def test_deferred_lights_brighten_near_pixels():
    fov, aspect = np.radians(70.0), 1.5
    h, w = 24, 36
    color = jnp.full((h, w, 3), 0.3)
    depth = jnp.full((h, w), 5.0)                     # flat wall
    # one warm light floating just in front of the wall center
    lpos = jnp.asarray([[0.0, 0.0, -3.5]])
    cl = jnp.zeros((16 * 8 * 24, 8), jnp.int32)       # every cluster: light 0
    out = np.asarray(pp.deferred_lights(
        color, depth, fov, aspect, lpos,
        jnp.asarray([[1.0, 0.8, 0.5]]), jnp.asarray([40.0]),
        jnp.asarray([10.0]), cl, (16, 8, 24), near=0.3, far_cluster=500.0))
    assert out[h // 2, w // 2, 0] > 0.5               # lit center
    assert out[h // 2, w // 2, 0] > out[h // 2, 2, 0] + 0.05  # falloff
    # empty cluster list leaves the color untouched
    out2 = np.asarray(pp.deferred_lights(
        color, depth, fov, aspect, lpos,
        jnp.asarray([[1.0, 0.8, 0.5]]), jnp.asarray([40.0]),
        jnp.asarray([10.0]), jnp.full_like(cl, -1), (16, 8, 24),
        near=0.3, far_cluster=500.0))
    np.testing.assert_allclose(out2, 0.3, atol=1e-5)


def test_deferred_lights_through_backend():
    from lumixengine_tpu import app as app_mod
    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.renderer import gpu_soft

    engine, renderer = demo_scenes.build_engine(model_instances=16)
    world = engine.create_world(capacity=16)
    cam = world.create_entity(position=(0.0, 0.0, 10.0), name="camera")
    world.create_component(cam, "camera", fov=np.radians(70.0))
    wall = world.create_entity(position=(0.0, 0.0, 0.0), scale=(4.0,) * 3)
    world.create_component(wall, "model_instance", model="cube")
    lamp = world.create_entity(position=(0.0, 0.0, 4.0))
    world.create_component(lamp, "point_light", color=(1.0, 0.2, 0.2),
                           intensity=50.0, range=15.0)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    img, _ = gpu_soft.render_frame(runner, None, width=120, height=68,
                                   max_instances=16)
    world.destroy_component(lamp, "point_light")
    img2, _ = gpu_soft.render_frame(runner, None, width=120, height=68,
                                    max_instances=16)
    # the lit frame is brighter where the wall faces the lamp
    assert img[34, 60].astype(int).sum() > img2[34, 60].astype(int).sum() + 20


def test_probe_bake_directional_and_cubemap_consistent():
    """bake_probe captures neighbors on the correct face, and the baked
    cubemap samples back through postprocess.cubemap_sky with the same
    convention (≙ the editor probe bake feeding the renderer)."""
    from lumixengine_tpu import app as app_mod
    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.renderer import probes

    engine, renderer = demo_scenes.build_engine(model_instances=16)
    world = engine.create_world(capacity=16)
    cam = world.create_entity(position=(0.0, 0.0, 30.0), name="camera")
    world.create_component(cam, "camera")
    cube = world.create_entity(position=(2.0, 0.0, 0.0), scale=(2.0,) * 3)
    world.create_component(cube, "model_instance", model="cube")
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)

    faces = probes.bake_probe(runner, (0.0, 0.0, 0.0), size=32,
                              max_instances=16)
    bg = 18.0 / 255.0
    hit = np.abs(faces - bg).max(axis=-1) > 0.02      # [6, S, S]
    assert hit[0].mean() > 0.02, hit[0].mean()         # +X face sees the cube
    assert hit[1].mean() == 0.0                        # -X face: empty
    # center of +X face is the cube, not background
    assert hit[0, 14:18, 14:18].all()

    # sample the baked cubemap along +X through the shader path
    rays = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (8, 8, 3))
    depth = jnp.full((8, 8), jnp.inf)
    out = np.asarray(pp.cubemap_sky(jnp.zeros((8, 8, 3)), depth, rays,
                                    jnp.asarray(faces), far=100.0))
    np.testing.assert_allclose(out[4, 4], faces[0, 16, 16], atol=0.05)

    # bake_all_probes registers cubemaps for probe components
    pe = world.create_entity(position=(0.0, 0.0, 0.0))
    world.create_component(pe, "environment_probe")
    baked = probes.bake_all_probes(runner, size=16)
    assert pe in baked and baked[pe].shape == (6, 16, 16, 3)


def test_nav_debug_overlay_marks_zone_cells():
    from lumixengine_tpu import app as app_mod
    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.renderer import gpu_soft

    engine = app_mod.create_full_engine(model_instances=8)
    world = engine.create_world(capacity=8)
    cam = world.create_entity(position=(16.0, 2.0, 44.0), name="camera")
    world.create_component(cam, "camera", fov=np.radians(70.0))
    nav = world.modules["navigation"]
    e = world.create_entity()
    world.create_component(e, "nav_zone", origin=(0.0, 0.0),
                           size=(32.0, 32.0), cell=1.0)
    nav.zone.block_aabb(10.0, 10.0, 20.0, 20.0)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    img, _ = gpu_soft.render_frame(runner, None, width=160, height=90,
                                   max_instances=8, debug_nav=True)
    orange = ((np.abs(img[..., 0].astype(int) - 230) < 30)
              & (np.abs(img[..., 1].astype(int) - 140) < 40)).sum()
    cyan = ((np.abs(img[..., 1].astype(int) - 220) < 40)
            & (np.abs(img[..., 2].astype(int) - 220) < 40)
            & (img[..., 0] < 140)).sum()
    assert orange > 20, orange              # blocked box visible
    assert cyan > 10, cyan                  # walkable boundary visible


def test_fsr_plugin_changes_output_resolution():
    from lumixengine_tpu import app as app_mod
    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.renderer import gpu_soft
    from lumixengine_tpu.renderer.plugins import FSR3Plugin

    engine, world, renderer = demo_scenes.headless_demo_world(num_entities=32)
    renderer.add_plugin(FSR3Plugin(scale=2.0, sharpness=0.5))
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    img, _ = gpu_soft.render_frame(runner, None, width=120, height=68,
                                   max_instances=64)
    assert img.shape == (136, 240, 3)               # presented at 2x
