import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumixengine_tpu.engine.world import World, WorldState, INVALID_ENTITY
from lumixengine_tpu.ops import hierarchy as hier
from lumixengine_tpu.core import host_math as hm
from lumixengine_tpu.core.transform import Transform


def test_create_destroy_recycles_slots():
    w = World(capacity=8)
    a = w.create_entity()
    b = w.create_entity()
    assert w.entity_count == 2
    w.destroy_entity(a)
    assert not w.is_alive(a)
    c = w.create_entity()
    assert c == a  # freelist recycles (≙ reference world.cpp freelist)
    assert w.entity_count == 2
    assert w.generation[c] == 1


def test_capacity_exhaustion():
    w = World(capacity=2)
    w.create_entity()
    w.create_entity()
    with pytest.raises(RuntimeError):
        w.create_entity()


def test_set_parent_preserves_global():
    w = World(capacity=8)
    p = w.create_entity(position=(10.0, 0.0, 0.0), rotation=hm.quat_from_axis_angle(np.array([0, 1, 0], np.float32), np.pi / 2))
    c = w.create_entity(position=(11.0, 2.0, 3.0))
    g_before = w.get_global_transform(c)
    w.set_parent(c, p)
    g_after = w.get_global_transform(c)
    np.testing.assert_allclose(g_after[0], g_before[0], atol=1e-5)
    np.testing.assert_allclose(np.abs(np.dot(g_after[1], g_before[1])), 1.0, atol=1e-5)
    # and unparenting restores it too
    w.set_parent(c, INVALID_ENTITY)
    g_unparented = w.get_global_transform(c)
    np.testing.assert_allclose(g_unparented[0], g_before[0], atol=1e-5)


def test_hierarchy_cycle_rejected():
    w = World(capacity=8)
    a = w.create_entity()
    b = w.create_entity()
    w.set_parent(b, a)
    with pytest.raises(ValueError):
        w.set_parent(a, b)


def test_destroy_parent_reparents_children_to_root():
    w = World(capacity=8)
    p = w.create_entity(position=(5.0, 0.0, 0.0))
    c = w.create_entity(position=(7.0, 0.0, 0.0))
    w.set_parent(c, p)
    w.destroy_entity(p)
    assert w.get_parent(c) == INVALID_ENTITY
    np.testing.assert_allclose(w.get_global_transform(c)[0], [7.0, 0.0, 0.0], atol=1e-5)


def test_levels_computed():
    w = World(capacity=8)
    a = w.create_entity()
    b = w.create_entity()
    c = w.create_entity()
    w.set_parent(b, a)
    w.set_parent(c, b)
    level, depth = hier.compute_levels_host(w.parent)
    assert depth == 2
    assert level[a] == 0 and level[b] == 1 and level[c] == 2


def test_device_propagate_matches_host_chain():
    rng = np.random.default_rng(0)
    w = World(capacity=64)
    entities = []
    for i in range(40):
        parent = INVALID_ENTITY if not entities or rng.random() < 0.3 else int(rng.choice(entities))
        e = w.create_entity(
            position=rng.normal(size=3).astype(np.float32),
            rotation=hm.quat_normalize(rng.normal(size=4).astype(np.float32)),
            scale=rng.uniform(0.5, 1.5, size=3).astype(np.float32),
        )
        if parent != INVALID_ENTITY:
            w.set_parent(e, parent)
            # then give it a random local
            w.set_local_transform(
                e,
                position=rng.normal(size=3).astype(np.float32),
                rotation=hm.quat_normalize(rng.normal(size=4).astype(np.float32)),
            )
        entities.append(e)

    state = w.device_state()
    for e in entities:
        sl = w.slot(e)  # device arrays are topo-sorted
        host_pos, host_rot, host_scale = w.get_global_transform(e)
        np.testing.assert_allclose(np.asarray(state.world.pos[:, sl]), host_pos, atol=1e-4)
        np.testing.assert_allclose(
            np.abs(np.dot(np.asarray(state.world.rot[:, sl]), host_rot)), 1.0, atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(state.world.scale[:, sl]), host_scale, atol=1e-4)


def test_propagate_deep_chain():
    # 30-deep chain of +1 x offsets
    w = World(capacity=64)
    prev = INVALID_ENTITY
    chain = []
    for i in range(30):
        e = w.create_entity(position=(1.0, 0.0, 0.0))
        if prev != INVALID_ENTITY:
            w.set_parent(e, prev)
            w.set_local_transform(e, position=(1.0, 0.0, 0.0))
        prev = e
        chain.append(e)
    state = w.device_state()
    np.testing.assert_allclose(np.asarray(state.world.pos[:, w.slot(chain[-1])]), [30.0, 0.0, 0.0], atol=1e-4)


def test_propagate_under_vmap():
    # two worlds with identical topology, different locals → vmapped propagate
    w = World(capacity=16)
    a = w.create_entity(position=(1.0, 0.0, 0.0))
    b = w.create_entity(position=(0.0, 1.0, 0.0))
    w.set_parent(b, a)
    s = w.device_state()

    def stack(x, y):
        return jax.tree_util.tree_map(lambda p, q: jnp.stack([p, q]), x, y)

    local2 = stack(s.local, Transform(pos=s.local.pos * 2, rot=s.local.rot, scale=s.local.scale))
    parent2 = jnp.stack([s.parent, s.parent])
    level2 = jnp.stack([s.level, s.level])
    out = jax.vmap(lambda l, p, lv: hier.propagate(l, p, lv, 1))(local2, parent2, level2)
    sb = w.slot(b)
    # set_parent preserved b's global (0,1,0) → local = (-1,1,0); doubling all
    # locals gives world1: a=(2,0,0), b = (2,0,0)+(-2,2,0) = (0,2,0)
    np.testing.assert_allclose(np.asarray(out.pos[0, :, sb]), [0.0, 1.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.pos[1, :, sb]), [0.0, 2.0, 0.0], atol=1e-5)

    # the static-plan fast path agrees with the masked path
    out2 = jax.vmap(lambda l: hier.propagate_plan(l, w.plan))(local2)
    np.testing.assert_allclose(np.asarray(out2.pos), np.asarray(out.pos), atol=1e-6)

    # and pointer doubling agrees too (uniform scale here → associative)
    out3 = jax.vmap(lambda l, p: hier.propagate_doubling(l, p, 1))(local2, parent2)
    np.testing.assert_allclose(np.asarray(out3.pos), np.asarray(out.pos), atol=1e-6)


def test_names_and_partitions():
    w = World(capacity=8)
    e = w.create_entity(name="player")
    assert w.get_entity_name(e) == "player"
    assert w.find_by_name("player") == e
    pid = w.create_partition("level2")
    assert pid == 1
