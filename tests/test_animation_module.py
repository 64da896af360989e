import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.models import demo_scenes


def build(n=32):
    engine, world, renderer, anim = demo_scenes.skinned_crowd_world(num_characters=n)
    return engine, world, renderer, anim


def test_crowd_step_advances_clocks_and_poses():
    engine, world, renderer, anim = build(16)
    step = engine.build_step(world, donate=False)
    state = world.device_state()
    dt = jnp.float32(1 / 30)
    s1 = step(state, dt)
    ms0 = state.modules["animation"]
    ms1 = s1.modules["animation"]
    # animable clocks advanced by dt*scale
    amod = world.modules["animation"]
    active = amod.animables.entity >= 0
    t0 = np.asarray(ms0.an_time)[active]
    t1 = np.asarray(ms1.an_time)[active]
    clips = np.asarray(amod.animables.data["clip"])[active]
    lengths = anim.bank_statics.clip_length[np.maximum(clips, 0)]
    scales = np.asarray(amod.animables.data["time_scale"])[active]
    expected = np.mod(t0 + float(dt) * scales, lengths)
    np.testing.assert_allclose(t1, expected, atol=1e-5)
    # animator clocks advanced
    c1 = np.asarray(ms1.ctrl_clocks)
    assert np.any(c1 > 0)
    # poses are valid quats on used pool columns
    rot = np.asarray(ms1.pose_rot)
    norms = np.linalg.norm(rot, axis=0)
    used_cols = np.nonzero(norms[0] > 0)[0]
    np.testing.assert_allclose(norms[:, used_cols], 1.0, atol=1e-3)
    assert int(ms1.counters["animated"]) == int(np.sum(active))


def test_animable_pose_matches_direct_sampling():
    engine, world, renderer, anim = build(8)
    amod = world.modules["animation"]
    step = engine.build_step(world, donate=False)
    state = world.device_state()
    dt = jnp.float32(1 / 30)
    s1 = step(state, dt)
    ms1 = s1.modules["animation"]

    from lumixengine_tpu.ops import pose as pose_ops, sampling

    st = amod.statics()
    bank = anim.bank
    bstat = anim.bank_statics
    g = st.an_groups[0]
    t = np.asarray(ms1.an_time)[g["cols"]]
    p, r = sampling.sample_clips(bank.table, jnp.asarray(t), jnp.asarray(g["clips"]), bstat)
    apos, arot = pose_ops.compute_absolute(p, r, g["plan"])
    np.testing.assert_allclose(
        np.asarray(ms1.pose_pos[:, :, g["cols"]]), np.asarray(apos), atol=1e-5
    )


def test_root_motion_moves_walking_animators():
    engine, world, renderer, anim = build(16)
    amod = world.modules["animation"]
    step = engine.build_step(world, donate=False)
    state = world.device_state()
    dt = jnp.float32(1 / 30)
    s = state
    for _ in range(8):
        s = step(s, dt)
    # animators with speed>0 play walk/run which carry XZ root translation
    st = amod.statics()
    g = st.at_groups[0]
    eslots = np.maximum(g["entity_slots"], 0)
    before = np.asarray(state.local.pos[:, eslots])
    after = np.asarray(s.local.pos[:, eslots])
    moved = np.linalg.norm(after - before, axis=0)
    speeds = amod.default_inputs[0, g["cols"]]
    # fast animators end up blending walk/run (root motion) → must have moved
    assert np.any(moved[speeds > 2.0] > 1e-4)
    # world transforms follow (propagation ran after update phase)
    assert not np.allclose(np.asarray(s.world.pos), np.asarray(state.world.pos))


def test_crowd_under_vmap():
    engine, world, renderer, anim = build(8)
    step_raw = engine.build_step(world, jit=False)
    state = world.device_state()
    from lumixengine_tpu.parallel.mesh import replicate_state

    batched = replicate_state(state, 3)
    # diverge input speeds across worlds
    ci = batched.modules["animation"].ctrl_inputs
    # world 0: all speeds 0 (pure idle); world 2: all speeds 4.5 (run)
    ci = ci.at[0, 0, :].set(0.0).at[2, 0, :].set(4.5)
    batched = batched.replace(modules={**batched.modules,
                                       "animation": batched.modules["animation"].replace(ctrl_inputs=ci)})
    stepv = jax.jit(jax.vmap(step_raw, in_axes=(0, None)))
    out = stepv(batched, jnp.float32(1 / 30))
    poses = np.asarray(out.modules["animation"].pose_rot)
    assert poses.shape[0] == 3
    # different speed inputs → different blended poses across worlds
    assert not np.allclose(poses[0], poses[2], atol=1e-5)
