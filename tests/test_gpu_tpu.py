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


def test_tpu_raster_material_albedo_and_clustered_lights():
    """VERDICT-r4 next #5: the TPU present shades per-mesh MATERIAL albedo
    and applies the clustered point lights — with the SAME deferred pass
    (postprocess.deferred_lights) the software present uses, so the two
    paths cross-check."""
    import jax.numpy as jnp
    from lumixengine_tpu.engine.engine import Engine
    from lumixengine_tpu.renderer.model import Model
    from lumixengine_tpu.renderer.material import Material
    from lumixengine_tpu.renderer.render_module import RendererSystem
    from lumixengine_tpu.renderer import clusters as CL
    from lumixengine_tpu.renderer import postprocess as pp

    engine = Engine()
    rsys = RendererSystem(engine)
    red_mat = rsys.materials.add(Material(
        "red", uniforms={"color_r": 1.0, "color_g": 0.1, "color_b": 0.1}))
    mid = rsys.add_model(Model(name="ball", bounding_radius=1.0,
                               material_id=red_mat))
    engine.add_system(rsys)
    world = engine.create_world(capacity=16)
    cam = world.create_entity(position=(0.0, 0.0, 6.0))
    world.create_component(cam, "camera", fov=np.pi / 3, near=0.1, far=100.0)
    e = world.create_entity(position=(0.0, 0.0, 0.0))
    world.create_component(e, "model_instance", model=mid)
    lt = world.create_entity(position=(0.0, 1.5, 1.5))
    world.create_component(lt, "point_light", range=12.0, intensity=6.0)

    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)

    lit_p = gpu_tpu.TpuPresent(width=96, height=64)
    rgb, depth, overflow = lit_p(runner)
    rgb, depth = np.asarray(rgb), np.asarray(depth)
    unlit_p = gpu_tpu.TpuPresent(width=96, height=64, lights=False)
    rgb0, depth0, _ = unlit_p(runner)
    rgb0 = np.asarray(rgb0)

    hit = depth < np.inf
    assert hit.any() and int(overflow) == 0
    # material albedo: the unlit surface is red-dominant (not the palette)
    fg = rgb0[hit].astype(np.float32)
    assert fg[:, 0].mean() > 2.0 * fg[:, 1].mean()
    # the point light visibly brightens lit geometry
    assert rgb[hit].astype(np.int32).sum() > rgb0[hit].astype(np.int32).sum()
    # background untouched by the light pass
    assert (rgb[~hit] == rgb0[~hit]).all()

    # cross-check: applying the SAME deferred pass to the unlit TPU output
    # reproduces the lit TPU output bit-for-bit (same inputs, same pass)
    st = world.modules["renderer"].statics()
    rs = runner.state.modules["renderer"]
    cl = CL.fill_clusters(runner.state, world.modules["renderer"],
                          statics=st)
    cam_e = int(st.cam_slots[0])
    import lumixengine_tpu.core.host_math as hm
    wpos = np.asarray(runner.state.world.pos)
    cpos, crot = wpos[:, cam_e], np.asarray(runner.state.world.rot)[:, cam_e]
    le = np.maximum(np.asarray(st.pl_slots), 0)
    lw = wpos[:, le].T
    lv = hm.quat_rotate(np.broadcast_to(hm.quat_conjugate(crot), (len(lw), 4)),
                        lw - cpos)
    ref = pp.deferred_lights(
        jnp.asarray(rgb0.astype(np.float32) / 255.0), jnp.asarray(depth0),
        float(np.asarray(rs.cam_fov[0])), 96 / 64, jnp.asarray(lv),
        jnp.moveaxis(rs.pl_color, 0, -1), rs.pl_intensity, rs.pl_range,
        cl.lights, grid=CL.GRID, near=float(np.asarray(rs.cam_near[0])),
        far_cluster=float(np.asarray(rs.cam_far[0])))
    ref8 = np.clip(np.asarray(ref) * 255.0, 0, 255).astype(np.uint8)
    assert (ref8 == rgb).all()

    # and the software present shades the same material albedo
    fb, zb = raster.rasterize_view(runner, width=96, height=64)
    hh = zb[:64] < np.inf
    sf = fb[:64][hh].astype(np.float32)
    assert sf[:, 0].mean() > 2.0 * sf[:, 1].mean()


def test_tpu_raster_draws_terrain():
    """Terrain heightfields bake into the TPU soup as static instances
    (gpu_tpu.terrain_mesh) — the device present draws the same ground the
    software path does (gpu_soft.draw_terrain)."""
    from lumixengine_tpu.models.demo_scenes import build_engine

    engine, renderer = build_engine(model_instances=8)
    hm = np.zeros((32, 32), np.float32)
    hm[12:20, 12:20] = 4.0                      # a plateau in the middle
    tid = renderer.terrains.add(hm, xz_scale=1.0, y_scale=1.0)
    world = engine.create_world(capacity=8)
    cam = world.create_entity(position=(16.0, 10.0, 40.0), name="cam")
    world.create_component(cam, "camera", fov=1.1, near=0.1, far=300.0)
    t = world.create_entity(position=(0.0, 0.0, 0.0), name="ground")
    world.create_component(t, "terrain", terrain=tid)

    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    # 96x64 = only 6 tiles for ~8k terrain triangles: raise the per-tile
    # slot cap so the completeness certificate can hold (it fired honestly
    # at the 192 default — thousands of triangles per tile)
    present = gpu_tpu.TpuPresent(width=96, height=64, lights=False,
                                 k_slots=2048)
    rgb, depth, overflow = present(runner)
    rgb, depth = np.asarray(rgb), np.asarray(depth)
    assert int(overflow) == 0
    hit = depth < np.inf
    assert hit.sum() > 500                      # the ground fills the view
    fg = rgb[hit].astype(np.float32)
    # terrain green dominates (89,140,79 base under flat Lambert)
    assert fg[:, 1].mean() > fg[:, 0].mean() > fg[:, 2].mean()


def test_tpu_raster_skins_characters():
    """Skinned vertices pose through the animation palette in the TPU
    raster's vertex stage (DQS, ≙ gpu_dx12's skinning vertex shader over
    computeSkeletonDualQuats): the real ybot mesh animates on the device
    present — the silhouette CHANGES as the run clip advances, while a
    rest-pose (unskinned) bake would be frame-invariant."""
    import os
    import pytest

    YBOT = "/root/reference/demo/models/ybot/ybot.fbx"
    RUN = "/root/reference/demo/models/ybot/run forward.fbx"
    if not os.path.exists(YBOT):
        pytest.skip("reference demo assets not present")
    from lumixengine_tpu.importers import fbx
    from lumixengine_tpu.models import demo_scenes

    model = fbx.to_model(fbx.load_fbx(YBOT), name="ybot")
    clip = fbx.to_clip(fbx.load_fbx(RUN), model.skeleton, name="run_tpu")
    engine, renderer, anim = demo_scenes.build_engine(
        with_animation=True, model_instances=4, animables=2, animators=0)
    mid = renderer.add_model(model)
    cid = anim.add_clip(clip)
    world = engine.create_world(capacity=8)
    cam = world.create_entity(position=(0.0, 1.0, 4.0), name="cam")
    world.create_component(cam, "camera", fov=1.1, near=0.1, far=100.0)
    e = world.create_entity(name="bot")
    world.create_component(e, "model_instance", model=mid)
    world.create_component(e, "animable", clip=cid)

    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)

    present = gpu_tpu.TpuPresent(width=128, height=72, lights=False)
    rgb0, d0, _ = present(runner)
    rgb0, d0 = np.asarray(rgb0).copy(), np.asarray(d0).copy()
    assert (d0 < np.inf).any()

    runner.run(15)                        # half a run cycle → new pose
    rgb1, d1, _ = present(runner)
    rgb1 = np.asarray(rgb1)
    changed = (rgb1 != rgb0).any(axis=-1).mean()
    assert changed > 0.0005, changed      # the silhouette moved

    # the soup really is skinned (not falling back to rest pose)
    from lumixengine_tpu.renderer.gpu_soft import skin_map

    st = world.modules["renderer"].statics()
    soup = gpu_tpu.bake_soup(st, renderer.models,
                             materials=renderer.materials,
                             skin_cols=skin_map(world))
    assert int((soup.vskin_col >= 0).sum()) > 10_000


def test_tpu_present_splats_particles():
    """Alive particles splat on the device present with z-test and depth
    write (gpu_tpu.splat_particles ≙ the software backend's additive point
    splats, gpu_soft.draw_particles)."""
    from lumixengine_tpu.models import demo_scenes

    engine, world, renderer = demo_scenes.particle_stress_world(capacity=2048)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(10)                        # let the storm emit

    on = gpu_tpu.TpuPresent(width=128, height=72, lights=False)
    rgb, depth, _ = on(runner)
    off = gpu_tpu.TpuPresent(width=128, height=72, lights=False,
                             particles=False)
    rgb0, depth0, _ = off(runner)
    rgb, rgb0 = np.asarray(rgb), np.asarray(rgb0)
    depth, depth0 = np.asarray(depth), np.asarray(depth0)

    changed = (rgb != rgb0).any(axis=-1)
    assert changed.sum() > 20, changed.sum()     # splats landed
    # splats own their depth: the depth buffer gained finite entries
    assert (np.isfinite(depth) & ~np.isfinite(depth0)).sum() > 10
    # and never BEHIND existing geometry (z-tested)
    both = np.isfinite(depth) & np.isfinite(depth0)
    assert (depth[both] <= depth0[both] + 1e-4).all()


def test_tpu_present_draws_procedural_geometry():
    """Procedural geometry soups draw at their entity transform on the
    device present (baked as extra soup instances, ≙ the software
    _draw_procedural fill)."""
    from lumixengine_tpu.models.demo_scenes import build_engine

    engine, renderer = build_engine(model_instances=4)
    world = engine.create_world(capacity=8)
    cam = world.create_entity(position=(0.0, 0.0, 6.0), name="cam")
    world.create_component(cam, "camera", fov=1.1, near=0.1, far=100.0)
    e = world.create_entity(position=(0.0, 0.0, 0.0), name="pg")
    tri = np.array([[-1.5, -1.0, 0.0], [1.5, -1.0, 0.0], [0.0, 1.5, 0.0]],
                   np.float32)
    world.create_component(e, "procedural_geometry", vertices=tri)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    present = gpu_tpu.TpuPresent(width=96, height=64, lights=False)
    rgb, depth, overflow = present(runner)
    rgb, depth = np.asarray(rgb), np.asarray(depth)
    assert int(overflow) == 0
    hit = depth < np.inf
    assert hit.sum() > 50
    fg = rgb[hit].astype(np.float32)
    # the soft path's procedural tint (176,122,161): red>blue>green
    assert fg[:, 0].mean() > fg[:, 2].mean() > fg[:, 1].mean()


def test_tpu_present_draws_grass():
    """Grass blades bake into the soup (gpu_tpu.grass_mesh, same scatter +
    color as the software _draw_grass) and draw above the terrain."""
    from lumixengine_tpu.models.demo_scenes import build_engine

    engine, renderer = build_engine(model_instances=4)
    hm = np.zeros((32, 32), np.float32)
    tid = renderer.terrains.add(hm, xz_scale=1.0, y_scale=1.0,
                                grass_types=[{"density": 2.0,
                                              "height": 1.5}])
    world = engine.create_world(capacity=8)
    cam = world.create_entity(position=(16.0, 3.0, 40.0), name="cam")
    world.create_component(cam, "camera", fov=1.1, near=0.1, far=300.0)
    t = world.create_entity(position=(0.0, 0.0, 0.0), name="ground")
    world.create_component(t, "terrain", terrain=tid)
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    present = gpu_tpu.TpuPresent(width=96, height=64, lights=False,
                                 k_slots=2048)
    rgb, depth, overflow = present(runner)
    rgb, depth = np.asarray(rgb), np.asarray(depth)
    assert int(overflow) == 0
    # grass green (96,168,72) appears: strongly green-dominant pixels
    fg = rgb.reshape(-1, 3).astype(np.float32)
    grassy = (fg[:, 1] > fg[:, 0] + 20) & (fg[:, 1] > fg[:, 2] + 30)
    assert grassy.sum() > 10, grassy.sum()


def test_tpu_present_composites_gui():
    """Runner.present_tpu composites the host GUI (rects/text) over the
    downloaded device framebuffer (gpu_soft.compose_gui — the same pass the
    software present uses, so the two UIs match)."""
    from lumixengine_tpu import app as app_mod2

    engine = app_mod2.create_full_engine()
    world = engine.create_world(capacity=8)
    cam = world.create_entity(position=(0.0, 0.0, 6.0), name="cam")
    world.create_component(cam, "camera", fov=1.1, near=0.1, far=100.0)
    panel = world.create_entity(name="panel")
    world.create_component(panel, "gui_rect", anchor=(0.1, 0.1, 0.4, 0.3))
    world.create_component(panel, "gui_image", color=(1.0, 0.2, 0.2, 0.9))
    runner = app_mod2.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    rgb, depth, _ = runner.present_tpu(width=96, height=64)
    rgb0, _, _ = runner.present_tpu(width=96, height=64, gui=False)
    diff = (rgb != rgb0).any(axis=-1)
    assert diff.sum() > 50                       # the panel landed
    ys, xs = np.nonzero(diff)
    assert ys.max() < 64 * 0.4 and xs.max() < 96 * 0.5   # where anchored
    px = rgb[diff].astype(np.float32)
    assert px[:, 0].mean() > px[:, 1].mean()      # red panel


def test_tpu_present_projects_decals():
    """Decal + curve-decal OBBs tint geometry on the device present through
    the SAME depth-projected pass the software present runs
    (postprocess.decal_pass), with poses composed from the live entity
    transform in-frame."""
    from lumixengine_tpu.models import demo_scenes

    engine, renderer = demo_scenes.build_engine(model_instances=16)
    world = engine.create_world(capacity=16)
    cam = world.create_entity(position=(0.0, 0.0, 10.0), name="camera")
    world.create_component(cam, "camera", fov=np.radians(70.0))
    wall = world.create_entity(position=(0.0, 0.0, 0.0), scale=(4.0,) * 3)
    world.create_component(wall, "model_instance", model="cube")
    dec = world.create_entity(position=(0.0, 0.0, 2.5))
    world.create_component(dec, "decal", material=3,
                           half_extents=(1.0, 1.0, 2.0))
    cd = world.create_entity(position=(0.0, 0.0, 2.5))
    world.create_component(cd, "curve_decal", material=6,
                           half_extents=(0.6, 1.0, 0.6),
                           bezier_p0=(-2.0, 0.0), bezier_p2=(2.0, 0.0))
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    present = gpu_tpu.TpuPresent(width=120, height=68, lights=False)
    rgb, depth, _ = present(runner)
    rgb = np.asarray(rgb)

    world.destroy_component(dec, "decal")
    world.destroy_component(cd, "curve_decal")
    runner.state = world.device_state()
    bare = gpu_tpu.TpuPresent(width=120, height=68, lights=False)
    rgb0, _, _ = bare(runner)
    rgb0 = np.asarray(rgb0)
    diff = np.abs(rgb.astype(int) - rgb0.astype(int)).max(axis=-1)
    assert (diff > 20).sum() > 30        # both decals tinted the wall


def test_tpu_present_draws_instanced_models():
    """InstancedModel chunks bake into the soup owner-relative and follow
    the owner's live transform (≙ encodeInstancedModels chunk draws)."""
    from lumixengine_tpu.models import demo_scenes

    engine, world, renderer = demo_scenes.headless_demo_world(num_entities=8)
    # find a free entity slot? build a dedicated scene instead
    engine, renderer = demo_scenes.build_engine(model_instances=8)
    world = engine.create_world(capacity=8)
    cam = world.create_entity(position=(0.0, 2.0, 14.0), name="cam")
    world.create_component(cam, "camera", fov=1.1, near=0.1, far=100.0)
    owner = world.create_entity(position=(0.0, 0.0, 0.0), name="rocks")
    n = 5
    world.create_component(
        owner, "instanced_model", model="cube",
        positions=np.stack([np.linspace(-6, 6, n), np.zeros(n),
                            np.zeros(n)], -1).astype(np.float32),
        rotations=np.tile([0, 0, 0, 1.0], (n, 1)).astype(np.float32),
        scales=np.ones((n, 3), np.float32))
    runner = app_mod.Runner([], engine=engine)
    runner.use_world(world)
    runner.start()
    runner.run(1)
    present = gpu_tpu.TpuPresent(width=128, height=64, lights=False)
    rgb, depth, overflow = present(runner)
    depth = np.asarray(depth)
    assert int(overflow) == 0
    cols_hit = np.nonzero((depth < np.inf).any(axis=0))[0]
    # five separated cubes → five distinct column runs across the screen
    runs = int((np.diff(cols_hit) > 1).sum()) + 1
    assert runs == n, (runs, cols_hit)
