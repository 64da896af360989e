"""Blend2D, IK node, PropertyAnimator."""
import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.animation.animation import make_walk_clip
from lumixengine_tpu.animation.controller import (
    AnimationNode, Blend2D, Controller, IKNode, Input,
)
from lumixengine_tpu.animation.module import AnimationSystem
from lumixengine_tpu.engine.engine import Engine
from lumixengine_tpu.renderer.model import Model, make_humanoid_skeleton
from lumixengine_tpu.renderer.render_module import RendererSystem


def build_engine_2d():
    engine = Engine()
    engine.module_capacities = {"model_instances": 32, "animables": 8, "animators": 8}
    renderer = RendererSystem(engine)
    sk = make_humanoid_skeleton(16, seed=3)
    renderer.add_model(Model(name="character", bounding_radius=1.0, skeleton=sk))
    engine.add_system(renderer)
    anim = AnimationSystem(engine, renderer=renderer)
    for i, name in enumerate(["n", "e", "w", "s"]):
        anim.add_clip(make_walk_clip(sk, name, frames=15, amplitude=0.3, seed=20 + i))
    ctrl = Controller(
        "strafe", anim.bank_statics,
        Blend2D(Input(0), Input(1),
                [((0.0, 1.0), AnimationNode(0)), ((1.0, 0.0), AnimationNode(1)),
                 ((-1.0, 0.0), AnimationNode(2)), ((0.0, -1.0), AnimationNode(3))]),
        inputs=["dir_x", "dir_y"],
    )
    anim.add_controller(ctrl)
    engine.add_system(anim)
    return engine, renderer, anim


def test_blend2d_weights_follow_inputs():
    engine, renderer, anim = build_engine_2d()
    world = engine.create_world(capacity=32)
    e1 = world.create_entity()
    world.create_component(e1, "model_instance", model="character")
    world.create_component(e1, "animator", controller="strafe",
                           inputs={"dir_x": 0.0, "dir_y": 1.0})  # pure "north"
    step = engine.build_step(world, donate=False)
    state = step(world.device_state(), jnp.float32(1 / 30))
    amod = world.modules["animation"]
    col = amod.pool_col_animator(amod.animators.slot_of(e1))
    pose_n = np.asarray(state.modules["animation"].pose_rot[:, :, col])

    # at (0,1) the pose must equal playing clip 0 alone at the same time
    from lumixengine_tpu.ops import pose as pose_ops, sampling
    t = np.asarray(state.modules["animation"].ctrl_clocks[0, amod.animators.slot_of(e1)])
    p, r = sampling.sample_clips(anim.bank.table, jnp.asarray([t]), jnp.asarray([0]),
                                 anim.bank_statics)
    st = amod.statics()
    apos, arot = pose_ops.compute_absolute(p, r, st.at_groups[0]["plan"])
    dots = np.abs(np.sum(pose_n * np.asarray(arot[:, :, 0]), axis=0))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_ik_node_pulls_chain_to_target():
    engine = Engine()
    engine.module_capacities = {"model_instances": 8, "animables": 4, "animators": 4}
    renderer = RendererSystem(engine)
    # straight-arm skeleton: chain of 6 bones along +X
    parent = np.array([-1, 0, 1, 2, 3, 4], np.int32)
    pos = np.zeros((6, 3), np.float32)
    pos[1:, 0] = 0.5
    rot = np.tile(np.array([0, 0, 0, 1.0], np.float32), (6, 1))
    from lumixengine_tpu.renderer.model import Skeleton
    sk = Skeleton(bone_parent=parent, bind_pos=pos, bind_rot=rot)
    renderer.add_model(Model(name="arm", bounding_radius=1.0, skeleton=sk))
    engine.add_system(renderer)
    anim = AnimationSystem(engine, renderer=renderer)
    clip = make_walk_clip(sk, "idle", frames=9, amplitude=0.0, seed=1)  # static pose
    anim.add_clip(clip)
    ctrl = Controller(
        "reach", anim.bank_statics,
        IKNode(AnimationNode(0), chain=[1, 2, 3, 4, 5],
               target_inputs=(0, 1, 2), alpha=1.0),
        inputs=["tx", "ty", "tz"],
    )
    anim.add_controller(ctrl)
    engine.add_system(anim)
    world = engine.create_world(capacity=8)
    e = world.create_entity()
    world.create_component(e, "model_instance", model="arm")
    world.create_component(e, "animator", controller="reach",
                           inputs={"tx": 1.0, "ty": 1.0, "tz": 0.5})
    step = engine.build_step(world, donate=False)
    state = step(world.device_state(), jnp.float32(1 / 30))
    amod = world.modules["animation"]
    col = amod.pool_col_animator(amod.animators.slot_of(e))
    effector = np.asarray(state.modules["animation"].pose_pos[:, 5, col])
    # target within reach (chain length 2.0 from bone1 at x=0.5): end reaches it
    np.testing.assert_allclose(effector, [1.0, 1.0, 0.5], atol=0.05)


def test_property_animator_drives_light_intensity():
    from lumixengine_tpu.models import demo_scenes

    engine, renderer = demo_scenes.build_engine(model_instances=16, animables=4, animators=4)
    from lumixengine_tpu.animation.module import AnimationSystem
    anim = AnimationSystem(engine, renderer=renderer)
    engine.add_system(anim)
    world = engine.create_world(capacity=16)
    light = world.create_entity()
    world.create_component(light, "point_light", intensity=1.0)
    world.create_component(light, "property_animator", curves=[{
        "component": "point_light", "property": "intensity",
        "times": [0.0, 1.0, 2.0], "values": [0.0, 10.0, 0.0],
    }])
    step = engine.build_step(world, donate=False)
    state = world.device_state()
    rmod = world.modules["renderer"]
    slot = rmod.point_lights.slot_of(light)
    vals = []
    for _ in range(45):  # 1.5s at 30fps
        state = step(state, jnp.float32(1 / 30))
        vals.append(float(state.modules["renderer"].pl_intensity[slot]))
    # rises toward 10 during the first second, then falls
    assert max(vals) > 8.0
    assert vals[10] < vals[29]
    assert vals[-1] < max(vals)


def test_select_cross_fades_and_resets_clocks():
    from lumixengine_tpu.animation.controller import Const, Select

    engine = Engine()
    engine.module_capacities = {"model_instances": 8, "animables": 4, "animators": 4}
    renderer = RendererSystem(engine)
    sk = make_humanoid_skeleton(8, seed=9)
    renderer.add_model(Model(name="character", bounding_radius=1.0, skeleton=sk))
    engine.add_system(renderer)
    anim = AnimationSystem(engine, renderer=renderer)
    anim.add_clip(make_walk_clip(sk, "a", frames=31, amplitude=0.2, seed=1))
    anim.add_clip(make_walk_clip(sk, "b", frames=31, amplitude=0.6, seed=2))
    ctrl = Controller("sel", anim.bank_statics,
                      Select(Input(0), [AnimationNode(0), AnimationNode(1)],
                             blend_length=0.2),
                      inputs=["which"])
    anim.add_controller(ctrl)
    engine.add_system(anim)
    world = engine.create_world(capacity=8)
    e = world.create_entity()
    world.create_component(e, "model_instance", model="character")
    world.create_component(e, "animator", controller="sel", inputs={"which": 0.0})
    step = engine.build_step(world, donate=False)
    state = world.device_state()
    amod = world.modules["animation"]
    slot = amod.animators.slot_of(e)
    col = amod.pool_col_animator(slot)
    # settle on clip a for a few frames
    for _ in range(10):
        state = step(state, jnp.float32(1 / 30))
    pose_a = np.asarray(state.modules["animation"].pose_rot[:, :, col])
    clock_b_before = float(state.modules["animation"].ctrl_clocks[1, slot])
    assert clock_b_before > 0.2  # b's clock has been free-running
    # switch to clip b: mid-fade pose differs from both endpoints
    ms = state.modules["animation"]
    state = state.replace(modules={**state.modules, "animation": ms.replace(
        ctrl_inputs=ms.ctrl_inputs.at[0, slot].set(1.0))})
    state = step(state, jnp.float32(1 / 30))
    # entered child's clock was reset (enter() semantics)
    clock_b = float(state.modules["animation"].ctrl_clocks[1, slot])
    assert clock_b < 0.05, clock_b
    mid = np.asarray(state.modules["animation"].pose_rot[:, :, col])
    assert not np.allclose(mid, pose_a, atol=1e-4)
    # after the fade completes, selection is fully on b
    for _ in range(12):
        state = step(state, jnp.float32(1 / 30))
    from lumixengine_tpu.ops import pose as pose_ops, sampling
    t = float(state.modules["animation"].ctrl_clocks[1, slot])
    p, r = sampling.sample_clips(anim.bank.table, jnp.asarray([t]), jnp.asarray([1]),
                                 anim.bank_statics)
    st = amod.statics()
    apos, arot = pose_ops.compute_absolute(p, r, st.at_groups[0]["plan"])
    final = np.asarray(state.modules["animation"].pose_rot[:, :, col])
    dots = np.abs(np.sum(final * np.asarray(arot[:, :, 0]), axis=0))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)
