import numpy as np
import jax.numpy as jnp
import pytest

from lumixengine_tpu.engine import serialize as ser
from lumixengine_tpu.models import demo_scenes


def test_native_lz4_roundtrip():
    from lumixengine_tpu.utils import native

    if not native.available():
        pytest.skip("no g++ toolchain")
    data = (b"hello world, hello world, hello TPU! " * 100
            + np.random.default_rng(0).bytes(512))
    comp = native.lz4_compress(data)
    assert len(comp) < len(data)
    assert native.lz4_decompress(comp, len(data)) == data


def test_native_lz4_incompressible_and_empty():
    from lumixengine_tpu.utils import native

    if not native.available():
        pytest.skip("no g++ toolchain")
    rnd = np.random.default_rng(1).bytes(10000)
    comp = native.lz4_compress(rnd)
    assert native.lz4_decompress(comp, len(rnd)) == rnd
    assert native.lz4_decompress(native.lz4_compress(b""), 0) == b""


def build_small():
    engine, world, renderer, anim = demo_scenes.skinned_crowd_world(num_characters=8)
    return engine, world


def test_world_roundtrip_preserves_everything():
    engine, world = build_small()
    blob = ser.serialize_world(world)
    world2 = ser.load_world(engine, blob)

    assert world2.entity_count == world.entity_count
    for e in range(world.capacity):
        assert world2.is_alive(e) == world.is_alive(e)
        if not world.is_alive(e):
            continue
        assert world2.get_parent(e) == world.get_parent(e)
        p1, r1, s1 = world.get_global_transform(e)
        p2, r2, s2 = world2.get_global_transform(e)
        np.testing.assert_allclose(p1, p2, atol=1e-6)
        np.testing.assert_allclose(s1, s2, atol=1e-6)
        assert world2.get_entity_name(e) == world.get_entity_name(e)
    # component membership preserved
    rm1 = world.modules["renderer"].model_instances
    rm2 = world2.modules["renderer"].model_instances
    for e in range(world.capacity):
        assert (e in rm1) == (e in rm2)
        if e in rm1:
            assert rm1.get(e, "model") == rm2.get(e, "model")
    am1 = world.modules["animation"]
    am2 = world2.modules["animation"]
    assert len(am1.animators) == len(am2.animators)
    # animator inputs survive
    for slot in range(am1.animators.capacity):
        e = int(am1.animators.entity[slot])
        if e < 0:
            continue
        s2slot = am2.animators.slot_of(e)
        np.testing.assert_allclose(
            am1.default_inputs[:, slot], am2.default_inputs[:, s2slot], atol=1e-6
        )
    # restored world can build a step and run
    step = engine.build_step(world2, donate=False)
    out = step(world2.device_state(), jnp.float32(1 / 60))
    assert int(out.frame) == 1


def test_physics_world_roundtrip():
    from tests.test_physics import build_world

    engine, world, phys = build_world()
    a = world.create_entity(position=(0.0, 5.0, 0.0))
    b = world.create_entity(position=(0.0, 3.0, 0.0))
    world.create_component(a, "rigid_actor", motion="static", shape="sphere", radius=0.1)
    world.create_component(b, "rigid_actor", motion="dynamic", shape="box",
                           half_extents=(0.4, 0.3, 0.2), mass=2.5, friction=0.7)
    j = world.create_entity()
    world.create_component(j, "distance_joint", body_a=a, body_b=b, length=2.0)
    blob = ser.serialize_world(world)
    world2 = ser.load_world(engine, blob)
    pm2 = world2.modules["physics"]
    assert pm2.actors.get(b, "mass") == np.float32(2.5)
    np.testing.assert_allclose(pm2.actors.get(b, "half_extents"), [0.4, 0.3, 0.2])
    st = pm2.statics()
    assert len(st.joint_a) == 1


def test_prefab_instantiate_with_remap():
    engine, world = build_small()
    # build a 3-entity prefab: root + 2 children, one with a model instance
    root = world.create_entity(position=(1.0, 2.0, 3.0), name="prefab_root")
    c1 = world.create_entity(position=(1.5, 2.0, 3.0))
    c2 = world.create_entity(position=(1.0, 2.5, 3.0))
    world.set_parent(c1, root)
    world.set_parent(c2, root)
    world.create_component(c1, "model_instance", model="cube")
    prefab = ser.make_prefab(world, [root])

    before = world.entity_count
    created = ser.instantiate_prefab(world, prefab, position=(10.0, 0.0, 0.0))
    assert world.entity_count == before + 3
    # new ids, same structure
    roots = [e for e in created if world.get_parent(e) == -1]
    assert len(roots) == 1
    nr = roots[0]
    kids = world.children_of(nr)
    assert len(kids) == 2
    np.testing.assert_allclose(world.get_global_transform(nr)[0], [10.0, 0.0, 0.0], atol=1e-5)
    # child keeps its local offset relative to the moved root
    offsets = sorted(round(float(world.get_global_transform(k)[0][0] - 10.0), 3) for k in kids)
    assert offsets == [0.0, 0.5]
    # component came along
    rm = world.modules["renderer"].model_instances
    assert any(k in rm for k in kids)


def test_version_gate():
    engine, world = build_small()
    blob = bytearray(ser.serialize_world(world))
    import struct
    struct.pack_into("<I", blob, 6, 999)
    # version is inside the manifest too; header gate triggers first on parse
    with pytest.raises(ValueError):
        ser._parse(bytes(blob))


def test_not_a_blob():
    engine, world = build_small()
    with pytest.raises(ValueError):
        ser.deserialize_into(world, b"garbage")


def test_device_state_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    engine, world = build_small()
    step = engine.build_step(world, donate=False)
    state = step(world.device_state(), jnp.float32(1 / 60))
    path = str(tmp_path / "sim.ckpt")
    ser.save_checkpoint(state, path)
    restored = ser.load_checkpoint(path, world.device_state())
    assert int(restored.frame) == 1
    np.testing.assert_allclose(np.asarray(restored.world.pos),
                               np.asarray(state.world.pos), atol=0)
    # resume stepping from the checkpoint
    out = step(restored, jnp.float32(1 / 60))
    assert int(out.frame) == 2
