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


PARTICLE_STRESS_SCRIPT = """
const G = 9.8;
emitter storm {
    material "/maps/particles/dust.mat"
    emit_per_second 200000
    max_particles %(cap)d
    out i_position : float3
    out i_color : float4
    out i_scale : float
    var pos : float3
    var vel : float3
    var t : float
    fn emit() {
        t = 0;
        pos.x = random(-50, 50);
        pos.y = random(20, 40);
        pos.z = random(-50, 50);
        vel.x = random(-1, 1);
        vel.y = 0;
        vel.z = random(-1, 1);
    }
    fn update() {
        t = t + time_delta;
        vel.y = vel.y - G * time_delta;
        pos = pos + vel * time_delta;
        if pos.y < 0 { kill(); }
        if t > 6 { kill(); }
    }
    fn output() {
        i_position = pos;
        i_scale = 0.05 + 0.02 * t;
        i_color = {0.8, 0.8, 0.9, 1};
    }
}
"""


SCRIPT_MOVER_LUA = """
local pos = {}
local t = 0
local speed = %(speed)f

function start()
    pos = this.position
end

function update(time_delta)
    t = t + time_delta * speed
    this.position = {
        pos[1] + math.cos(t) * 3,
        pos[2] + math.abs(math.sin(t * 0.7)),
        pos[3] + math.sin(t) * 3
    }
end
"""


def script_stress_world(num_scripts: int = 64):
    """Script-heavy config (VERDICT-r4 next #8): every entity runs a real
    Lua update() (the demo's move.lua kinematics pattern) — compiled to the
    device fast path (script/lua_fastpath.py), so the per-frame script cost
    scales with the world batch instead of stalling it host-side. Returns
    (engine, world, renderer)."""
    from lumixengine_tpu import app as app_mod
    from lumixengine_tpu.renderer.model import Model

    engine = app_mod.create_full_engine(model_instances=num_scripts + 2)
    rsys = engine.system_manager.get_system("renderer_system")
    mid = rsys.add_model(Model(name="mover_ball", bounding_radius=0.5))
    world = engine.create_world(capacity=num_scripts + 8)
    cam = world.create_entity(position=(0.0, 10.0, 60.0), name="camera")
    world.create_component(cam, "camera")
    sm = world.modules["script"]
    rng = np.random.default_rng(3)
    for i in range(num_scripts):
        e = world.create_entity(
            position=tuple(rng.uniform(-30, 30, 3).astype(float)),
            name=f"mover{i}")
        world.create_component(e, "model_instance", model=mid)
        sm.attach_lua_script(
            e, source=SCRIPT_MOVER_LUA % {"speed": 0.5 + 0.1 * (i % 7)})
    return engine, world, world.modules["renderer"]


def particle_stress_world(capacity: int = 1_000_000):
    """1M-particle stress (BASELINE.md config 4): one emitter script at 1M
    capacity. Returns (engine, world, renderer)."""
    engine, renderer = build_engine(model_instances=8)
    renderer.add_particle_script("storm", PARTICLE_STRESS_SCRIPT % {"cap": capacity})
    world = engine.create_world(capacity=8)
    cam = world.create_entity(position=(0.0, 10.0, 80.0), name="camera")
    world.create_component(cam, "camera")
    e = world.create_entity(name="storm")
    world.create_component(e, "particle_emitter", script="storm")
    return engine, world, renderer


def full_frame_world(
    num_entities: int = 10240,
    num_characters: int = 64,
    num_bodies: int = 64,
    particle_capacity: int = 2048,
    seed: int = 0,
):
    """The headline config (BASELINE.md config 5): one world with transform
    hierarchy + frustum culling + skinned characters + rigid bodies +
    particles, all in the single fused step — vmapped over thousands of worlds
    by the bench. Returns (engine, world, renderer, anim, physics_system)."""
    from lumixengine_tpu.physics.module import PhysicsSystem

    rng = np.random.default_rng(seed)
    engine, renderer, anim = build_engine(
        with_animation=True,
        model_instances=num_entities,
        animables=max(num_characters // 2, 1),
        animators=max(num_characters // 2, 1),
        actors=num_bodies,
    )
    phys = PhysicsSystem(engine)
    engine.add_system(phys)
    renderer.add_particle_script("storm", PARTICLE_STRESS_SCRIPT % {"cap": particle_capacity})
    world = engine.create_world(capacity=num_entities)

    cam = world.create_entity(position=(0.0, 15.0, 80.0), name="camera")
    world.create_component(cam, "camera", fov=np.radians(70.0), near=0.3, far=600.0)
    env = world.create_entity(name="sun")
    world.create_component(env, "environment", color=(1.0, 0.95, 0.9), intensity=2.5)
    pe = world.create_entity(name="storm")
    world.create_component(pe, "particle_emitter", script="storm")

    # characters (half animable, half animator with locomotion + root motion)
    n_anim = num_characters // 2
    for i in range(num_characters):
        e = world.create_entity(
            position=(rng.uniform(-60, 60), 0.0, rng.uniform(-60, 60)),
            rotation=hm.quat_from_axis_angle(np.array([0, 1, 0], np.float32),
                                             rng.uniform(0, 2 * np.pi)),
        )
        world.create_component(e, "model_instance", model="character")
        if i < n_anim:
            world.create_component(e, "animator", controller="locomotion",
                                   inputs={"speed": float(rng.uniform(0, 5))})
        else:
            world.create_component(e, "animable",
                                   clip=["idle", "walk", "run"][int(rng.integers(3))],
                                   start_time=float(rng.uniform(0, 1)))

    # falling rigid bodies (boxes + spheres)
    for i in range(num_bodies):
        e = world.create_entity(
            position=(rng.uniform(-20, 20), rng.uniform(2, 30), rng.uniform(-20, 20)),
        )
        world.create_component(e, "model_instance", model="cube")
        if rng.random() < 0.5:
            world.create_component(e, "rigid_actor", motion="dynamic", shape="box",
                                   half_extents=(0.5, 0.5, 0.5), friction=0.6)
        else:
            world.create_component(e, "rigid_actor", motion="dynamic", shape="sphere",
                                   radius=0.5, friction=0.4)

    # the rest: static scenery with hierarchy (≤ depth 4) + lights
    n_lights = 64
    lights = 0
    model_names = ["cube", "rock", "tree"]
    props = []
    prop_level = {}
    while world.entity_count < num_entities:
        if lights < n_lights:
            e = world.create_entity(position=rng.uniform(-100, 100, 3).astype(np.float32))
            world.create_component(e, "point_light", color=rng.uniform(0.2, 1.0, 3),
                                   intensity=rng.uniform(1, 8), range=rng.uniform(5, 25))
            lights += 1
            continue
        parent = -1
        if props and rng.random() < 0.3:
            cand = int(rng.choice(props[-256:]))
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
        world.create_component(e, "model_instance", model=model_names[int(rng.integers(3))])
        props.append(e)
    return engine, world, renderer, anim, phys


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
