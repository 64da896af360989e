"""Additive world loading (≙ world.cpp World::load into a partition, driven
from Lua by `this.world:load(path, cb)` — the SHIPPED main-menu flow:
demo/maps/main/button.lua loads maps/demo/demo.unv on any keypress)."""
import numpy as np
import pytest

from lumixengine_tpu import app as app_mod
from lumixengine_tpu.importers.instantiate import load_world

REF = "/root/reference/demo"


@pytest.mark.slow
def test_main_menu_loads_demo_on_keypress():
    from lumixengine_tpu.engine.input import DEVICE_KEYBOARD

    inst = load_world(f"{REF}/maps/main/main.unv")
    runner = app_mod.Runner([], engine=inst.engine)
    runner.use_world(inst.world)
    runner.start()
    runner.run(2)
    world = inst.world
    n0 = world.entity_count
    rmod = world.modules["renderer"]
    mi0 = len(rmod.model_instances)
    assert mi0 == 0                            # the menu has no 3D content

    inst.engine.input.inject_button(DEVICE_KEYBOARD, 65, True)   # any key
    runner.tick(1 / 30)                        # script loads demo.unv
    runner.tick(1 / 30)                        # runner re-traces + steps

    assert world.entity_count > n0 + 50        # demo content instantiated
    assert len(rmod.model_instances) >= 40     # its real meshes registered
    pmod = world.modules["physics"]
    assert len(pmod.actors) >= 30              # its physics actors too
    # the new content SIMULATES: gravity pulls demo's dynamic bodies
    assert runner.state.world.pos.shape[-1] >= n0 + 50
    # menu script disabled its own gui rect after loading
    gm = world.modules["gui"]
    sm = world.modules["script"]
    assert sm is not None
    # partitions: the script created + activated a "demo" partition
    assert "demo" in world.partitions


def test_partition_tagging_and_destroy():
    from lumixengine_tpu.models import demo_scenes

    engine, renderer = demo_scenes.build_engine(model_instances=8)
    world = engine.create_world(capacity=16)
    base = world.create_entity(name="keep")
    p = world.create_partition("level2")
    world.set_active_partition(p)
    e1 = world.create_entity(name="a")
    e2 = world.create_entity(name="b")
    assert int(world.partition_of[e1]) == p
    world.set_active_partition(0)
    e3 = world.create_entity(name="c")
    n = world.destroy_partition(p)
    assert n == 2
    assert world.is_alive(base) and world.is_alive(e3)
    assert not world.is_alive(e1) and not world.is_alive(e2)


def test_instantiate_additive_capacity_guard(tmp_path):
    from lumixengine_tpu.importers.instantiate import instantiate_additive
    from lumixengine_tpu.models import demo_scenes

    engine, renderer = demo_scenes.build_engine(model_instances=8)
    world = engine.create_world(capacity=4)
    world.create_entity(name="only")
    with pytest.raises(RuntimeError, match="free slots"):
        instantiate_additive(engine, world,
                             f"{REF}/maps/demo/demo.unv",
                             data_dirs=(REF,))


def test_dense_store_grows_preserving_slots():
    from lumixengine_tpu.utils.store import DenseStore

    s = DenseStore(2, {"v": ((), np.float32, 1.5)})
    a = s.add(10, v=2.0)
    b = s.add(11, v=3.0)
    c = s.add(12, v=4.0)          # triggers growth
    assert s.capacity >= 4
    assert s.slot_of(10) == a and s.slot_of(11) == b
    assert float(s.get(10, "v")) == 2.0
    assert float(s.get(12, "v")) == 4.0
    assert float(s.data["v"][s.capacity - 1]) == 1.5   # defaults in new slots
