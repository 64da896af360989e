"""Procedural demo scenes — the benchmark configs from BASELINE.md.

The reference ships binary stress maps (demo/maps/{anim_stress_test,
physics_stress_test, particles, ...}); we can't load .unv worlds, so each config
is rebuilt procedurally at equivalent scale with the same subsystem mix:

  * headless_demo_world  — ~2k entities, hierarchy + model instances + camera
                           + lights (≙ "headless demo map tick")
  * full_frame_world     — 10k entities/world: hierarchy + cull + anim +
                           physics + particles, vmapped over worlds (the
                           1e8 entity-steps/sec/chip headline config)
"""
from __future__ import annotations

import numpy as np

from lumixengine_tpu.core import host_math as hm
from lumixengine_tpu.engine.engine import Engine
from lumixengine_tpu.renderer.model import Model, Skeleton, make_humanoid_skeleton
from lumixengine_tpu.renderer.render_module import RendererSystem


def _add_demo_models(renderer: RendererSystem, with_skeletons: bool = True):
    renderer.add_model(Model(name="cube", bounding_radius=0.87, material_id=1))
    renderer.add_model(
        Model(
            name="rock",
            bounding_radius=1.5,
            lod_distances=np.array([20.0, 60.0, 150.0, np.inf], np.float32),
            material_id=2,
        )
    )
    renderer.add_model(Model(name="tree", bounding_radius=4.0,
                             lod_distances=np.array([40.0, 120.0, np.inf, np.inf], np.float32),
                             material_id=3))
    if with_skeletons:
        renderer.add_model(
            Model(name="character", bounding_radius=1.2, material_id=4,
                  skeleton=make_humanoid_skeleton(32, seed=7))
        )
    return renderer


def build_engine(with_animation: bool = False, **caps):
    engine = Engine()
    engine.module_capacities = caps
    renderer = RendererSystem(engine)
    _add_demo_models(renderer)
    engine.add_system(renderer)
    if with_animation:
        from lumixengine_tpu.animation.animation import XZ_ROOT_TRANSLATION, make_walk_clip
        from lumixengine_tpu.animation.controller import AnimationNode, Blend1D, Controller, Input
        from lumixengine_tpu.animation.module import AnimationSystem

        anim = AnimationSystem(engine, renderer=renderer)
        sk = renderer.models.get(renderer.models.get_id("character")).skeleton
        anim.add_clip(make_walk_clip(sk, "idle", frames=25, fps=24.0, amplitude=0.1, seed=11))
        anim.add_clip(make_walk_clip(sk, "walk", frames=31, fps=30.0, amplitude=0.4, seed=12,
                                     flags=XZ_ROOT_TRANSLATION))
        anim.add_clip(make_walk_clip(sk, "run", frames=21, fps=30.0, amplitude=0.7, seed=13,
                                     flags=XZ_ROOT_TRANSLATION))
        # locomotion: blend idle→walk→run by a "speed" input (≙ demo anim ctrl)
        ctrl = Controller(
            "locomotion",
            anim.bank_statics,
            Blend1D(
                Input(0),
                [(0.0, AnimationNode(0)), (1.5, AnimationNode(1)), (4.0, AnimationNode(2))],
            ),
            inputs=["speed"],
        )
        anim.add_controller(ctrl)
        engine.add_system(anim)
        return engine, renderer, anim
    return engine, renderer


def skinned_crowd_world(
    num_characters: int = 256,
    animator_fraction: float = 0.5,
    seed: int = 0,
):
    """256-character skinned crowd (BASELINE.md config 2): half Animables
    (looping clips), half Animators (locomotion controller with root motion).
    Returns (engine, world, renderer, anim)."""
    rng = np.random.default_rng(seed)
    engine, renderer, anim = build_engine(
        with_animation=True,
        model_instances=num_characters + 8,
        animables=num_characters,
        animators=num_characters,
    )
    world = engine.create_world(capacity=num_characters + 8)
    cam = world.create_entity(position=(0.0, 10.0, 60.0), name="camera")
    world.create_component(cam, "camera", fov=np.radians(70.0), near=0.3, far=500.0)
    n_animators = int(num_characters * animator_fraction)
    for i in range(num_characters):
        e = world.create_entity(
            position=(rng.uniform(-50, 50), 0.0, rng.uniform(-50, 50)),
            rotation=hm.quat_from_axis_angle(np.array([0, 1, 0], np.float32),
                                             rng.uniform(0, 2 * np.pi)),
        )
        world.create_component(e, "model_instance", model="character")
        if i < n_animators:
            world.create_component(
                e, "animator", controller="locomotion",
                inputs={"speed": float(rng.uniform(0.0, 5.0))},
            )
        else:
            world.create_component(
                e, "animable", clip=["idle", "walk", "run"][int(rng.integers(3))],
                start_time=float(rng.uniform(0, 1)),
            )
    return engine, world, renderer, anim


def headless_demo_world(
    num_entities: int = 2048,
    seed: int = 0,
    engine: Engine | None = None,
    hierarchy_fraction: float = 0.35,
    instance_fraction: float = 0.9,
):
    """~2k-entity scene: scattered props, some parented (depth ≤4), one camera,
    32 point lights. Returns (engine, world, renderer_system)."""
    rng = np.random.default_rng(seed)
    if engine is None:
        engine, renderer = build_engine(model_instances=num_entities)
    else:
        renderer = engine.system_manager.get_system("renderer_system")
    world = engine.create_world(capacity=num_entities)

    cam = world.create_entity(position=(0.0, 5.0, 40.0), name="camera")
    world.create_component(cam, "camera", fov=np.radians(70.0), near=0.3, far=500.0)

    env = world.create_entity(name="sun")
    world.create_component(env, "environment", color=(1.0, 0.96, 0.9), intensity=3.0)

    n_lights = min(32, num_entities // 16)
    for i in range(n_lights):
        e = world.create_entity(position=rng.uniform(-80, 80, 3).astype(np.float32))
        world.create_component(e, "point_light", color=rng.uniform(0.2, 1.0, 3),
                               intensity=rng.uniform(1, 8), range=rng.uniform(5, 25))

    model_names = ["cube", "rock", "tree"]
    props = []
    prop_level = {}
    budget = num_entities - world.entity_count
    for i in range(budget):
        parent = -1
        if props and rng.random() < hierarchy_fraction:
            cand = int(rng.choice(props[-256:]))
            # cap hierarchy at depth 4 (typical game scene; keeps the
            # propagation scan shallow)
            if prop_level.get(cand, 0) < 3:
                parent = cand
        pos = rng.uniform(-100, 100, 3).astype(np.float32)
        pos[1] = abs(pos[1]) * 0.1
        axis = rng.normal(size=3).astype(np.float32)
        axis /= np.linalg.norm(axis)
        e = world.create_entity(
            position=pos,
            rotation=hm.quat_from_axis_angle(axis, rng.uniform(0, np.pi)),
            scale=np.full(3, rng.uniform(0.5, 2.0), np.float32),
        )
        if parent >= 0:
            world.set_parent(e, parent)
            world.set_local_transform(e, position=rng.uniform(-3, 3, 3).astype(np.float32))
        prop_level[e] = prop_level.get(parent, -1) + 1 if parent >= 0 else 0
        if rng.random() < instance_fraction:
            world.create_component(e, "model_instance", model=model_names[int(rng.integers(3))])
        props.append(e)
    return engine, world, renderer
