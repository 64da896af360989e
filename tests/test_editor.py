import numpy as np

from lumixengine_tpu.editor.commands import (
    AddComponentCommand, CommandStack, CreateEntityCommand,
    DestroyEntitiesCommand, SetPropertyCommand, SetTransformCommand,
)
from lumixengine_tpu.engine import reflection
from lumixengine_tpu.models import demo_scenes


def build(spare_capacity: int = 0):
    reflection.register_builtin_components()
    engine, world, renderer = demo_scenes.headless_demo_world(num_entities=64)
    if spare_capacity:
        world = engine.create_world(capacity=spare_capacity)
    return engine, world, CommandStack(world)


def test_property_undo_redo_and_merge():
    engine, world, stack = build()
    lights = [e for e in range(world.capacity)
              if world.is_alive(e) and world.has_component(e, "point_light")]
    e = lights[0]
    orig = float(reflection.registry.get_property(world, e, "point_light", "intensity"))
    stack.execute(SetPropertyCommand(e, "point_light", "intensity", 5.0))
    # continuous slider drag merges into one undo entry
    stack.execute(SetPropertyCommand(e, "point_light", "intensity", 6.0))
    stack.execute(SetPropertyCommand(e, "point_light", "intensity", 7.0))
    assert float(reflection.registry.get_property(world, e, "point_light", "intensity")) == 7.0
    assert len(stack._undo) == 1
    stack.undo()
    assert float(reflection.registry.get_property(world, e, "point_light", "intensity")) == orig
    stack.redo()
    assert float(reflection.registry.get_property(world, e, "point_light", "intensity")) == 7.0


def test_transform_undo():
    engine, world, stack = build(spare_capacity=16)
    e = world.create_entity(position=(1.0, 2.0, 3.0))
    stack.execute(SetTransformCommand(e, position=(9.0, 9.0, 9.0)))
    np.testing.assert_allclose(world.get_global_transform(e)[0], [9, 9, 9], atol=1e-5)
    stack.undo()
    np.testing.assert_allclose(world.get_global_transform(e)[0], [1, 2, 3], atol=1e-5)


def test_create_destroy_undo_restores_subtree_and_components():
    engine, world, stack = build(spare_capacity=16)
    cmd = CreateEntityCommand(position=(5.0, 0.0, 0.0), name="boss")
    stack.execute(cmd)
    boss = cmd.entity
    stack.execute(AddComponentCommand(boss, "point_light", intensity=3.0))
    child = world.create_entity(position=(5.5, 0.0, 0.0), name="minion")
    world.set_parent(child, boss)

    stack.execute(DestroyEntitiesCommand([boss]))
    assert not world.is_alive(boss) and not world.is_alive(child)
    stack.undo()  # restores boss + child + light component with original ids
    assert world.is_alive(boss) and world.is_alive(child)
    assert world.get_parent(child) == boss
    assert world.has_component(boss, "point_light")
    assert world.get_entity_name(child) == "minion"
    # undo the component add, then the create
    stack.undo()
    assert not world.has_component(boss, "point_light")
    stack.undo()
    assert not world.is_alive(boss)
