"""shard_map coverage: the sharded world-batch step must run on the 8 virtual
CPU devices (conftest) and match the single-process vmap oracle bit-for-bit,
with the psum'd metric equal to the per-world sum (≙ SURVEY.md §2.7/§2.8)."""
import jax
import jax.numpy as jnp
import pytest

from lumixengine_tpu.models import demo_scenes
from lumixengine_tpu.parallel.mesh import (
    build_sharded_step,
    make_world_mesh,
    replicate_state,
    shard_world_batch,
)


@pytest.fixture(scope="module")
def demo_step():
    engine, world, _ = demo_scenes.headless_demo_world(num_entities=64)
    rmod = world.modules["renderer"]

    def extra(ws, dt):
        return rmod.cull_pass(ws, dt)

    step_raw = engine.build_step(world, extra=extra, jit=False)
    return step_raw, world.device_state()


def test_eight_virtual_devices_present():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) >= 8


def test_sharded_step_matches_vmap_oracle(demo_step):
    step_raw, state = demo_step
    n = 8
    mesh = make_world_mesh(n_devices=n)
    dt = jnp.float32(1.0 / 60.0)
    batched = replicate_state(state, n * 2, perturb_key=jax.random.PRNGKey(7))

    oracle = jax.jit(jax.vmap(lambda s: step_raw(s, dt)))(batched)
    oracle_vis = jnp.sum(oracle.modules["renderer"].counters["visible_count"])

    sharded = shard_world_batch(batched, mesh)
    stepv = build_sharded_step(step_raw, mesh, donate=False, with_metrics=True)
    out, metrics = stepv(sharded, dt)
    jax.block_until_ready((out, metrics))

    assert int(metrics["visible_total"]) == int(oracle_vis)
    # bitwise equality: sharding must not change the computation
    for got, want in [
        (out.world.pos, oracle.world.pos),
        (out.world.rot, oracle.world.rot),
        (out.local.pos, oracle.local.pos),
    ]:
        assert jnp.array_equal(got, want)
    assert int(out.frame[0]) == 1


def test_sharded_step_multiple_steps_and_donation(demo_step):
    step_raw, state = demo_step
    mesh = make_world_mesh(n_devices=4)
    dt = jnp.float32(1.0 / 60.0)
    batched = replicate_state(state, 8, perturb_key=jax.random.PRNGKey(3))
    sharded = shard_world_batch(batched, mesh)
    stepv = build_sharded_step(step_raw, mesh, donate=True, with_metrics=True)
    for i in range(3):
        sharded, metrics = stepv(sharded, dt)
    assert int(sharded.frame[0]) == 3
    assert int(metrics["visible_total"]) >= 0


@pytest.mark.slow
def test_dryrun_worker_inprocess():
    """The exact body the driver's subprocess runs, on the conftest devices."""
    from lumixengine_tpu.parallel import dryrun

    assert dryrun.main(8) == 0
