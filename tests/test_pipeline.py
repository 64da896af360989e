import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.models import demo_scenes
from lumixengine_tpu.renderer import pipeline as pipe


def build(n=256):
    engine, world, renderer = demo_scenes.headless_demo_world(num_entities=n)
    return engine, world, renderer


def test_fused_step_runs_and_culls():
    engine, world, renderer = build()
    rmod = world.modules["renderer"]

    def extra(ws, dt):
        return rmod.cull_pass(ws, dt)

    step = engine.build_step(world, extra=extra, donate=False)
    state = world.device_state()
    out = step(state, jnp.float32(1 / 60))
    assert int(out.frame) == 1
    rs = out.modules["renderer"]
    vis = int(rs.counters["visible_count"])
    total = int(np.sum(np.asarray(rs.mi_entity) >= 0))
    # camera at (0,5,40) looking -Z over a ±100 scatter: some but not all visible
    assert 0 < vis < total


def test_prepare_view_orders_visible_first():
    engine, world, renderer = build()
    state = world.device_state()
    rs = state.modules["renderer"]
    view = pipe.prepare_view(state, world.modules["renderer"], cam_slot=0)
    vis_count = int(view.visible_count)
    ordered_models = np.asarray(view.instance_model)
    # all visible instances come first in draw order, invisible compacted to tail
    assert np.all(ordered_models[:vis_count] >= 0)
    assert np.all(ordered_models[vis_count:] == -1)
    # material-bucket keys are non-decreasing over the visible prefix
    keys = np.asarray(view.sort_key)[np.asarray(view.order)]
    assert np.all(np.diff(keys.astype(np.int64)[:vis_count]) >= 0)


def test_lod_selection_by_distance():
    # SoA: lod_dist2 is [4, K] (4 switch distances per instance column)
    lod2 = jnp.array([[10.0**2], [30.0**2], [90.0**2], [np.inf]])
    d2 = jnp.array([5.0**2, 15.0**2, 50.0**2, 100.0**2])
    lods = pipe.select_lod(d2, jnp.broadcast_to(lod2, (4, 4)))
    np.testing.assert_array_equal(np.asarray(lods), [0, 1, 2, 3])


def test_prev_frame_transform_snapshot():
    engine, world, renderer = build(64)
    step = engine.build_step(world, donate=False)
    state = world.device_state()
    pos0 = np.asarray(state.world.pos).copy()
    out = step(state, jnp.float32(1 / 60))
    rs = out.modules["renderer"]
    eidx = np.maximum(np.asarray(rs.mi_entity), 0)
    np.testing.assert_allclose(np.asarray(rs.prev_pos), pos0[:, eidx], atol=1e-6)


def test_step_under_vmap_batches_worlds():
    engine, world, renderer = build(128)
    rmod = world.modules["renderer"]

    def extra(ws, dt):
        return rmod.cull_pass(ws, dt)

    step_raw = engine.build_step(world, extra=extra, jit=False)
    state = world.device_state()
    from lumixengine_tpu.parallel.mesh import replicate_state

    batched = replicate_state(state, 4, perturb_key=jax.random.PRNGKey(1))
    stepv = jax.jit(jax.vmap(step_raw, in_axes=(0, None)))
    out = stepv(batched, jnp.float32(1 / 60))
    assert out.frame.shape == (4,)
    assert np.all(np.asarray(out.frame) == 1)
    # perturbed worlds should still have similar visible counts
    counts = np.asarray(out.modules["renderer"].counters["visible_count"])
    assert counts.shape == (4,) and np.all(counts > 0)


def test_resolve_cam_slot_validates_and_maps_entities():
    # ≙ crash_20260817_061512.txt: RenderModule.active_camera stores an entity
    # id; passing it as cam_slot used to IndexError inside the traced gather
    import pytest

    engine, world, renderer = build(16)
    rmod = world.modules["renderer"]
    st = rmod.statics()
    assert pipe.resolve_cam_slot(st, 0) == 0
    cam_entity = int(st.cam_entities[0])
    if cam_entity >= len(st.cam_slots):  # entity ids map back to their slot
        assert pipe.resolve_cam_slot(st, cam_entity) == 0
    with pytest.raises(ValueError, match="cam_slot"):
        pipe.resolve_cam_slot(st, 999999)
    # the active_camera entity id is accepted at the view entry point
    state = world.device_state()
    view = pipe.prepare_view(state, rmod, cam_slot=rmod.active_camera)
    assert int(view.visible_count) >= 0
