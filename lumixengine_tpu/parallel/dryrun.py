"""Multi-chip dry run worker (≙ SURVEY.md §2.7/§2.8 scaling check).

Run as ``python -m lumixengine_tpu.parallel.dryrun <n_devices>`` with
``JAX_PLATFORMS=cpu`` and ``--xla_force_host_platform_device_count=<n>`` in
``XLA_FLAGS`` set *before* Python starts — `__graft_entry__.dryrun_multichip`
spawns this in a subprocess precisely so the ambient (possibly TPU) backend of
the caller can never leak into the mesh run.

Body: build the full fused frame step, make an ``n``-device 1-D "worlds" mesh,
shard a 2n-world batch over it (pure DP over the world axis — the engine's
scaling design), jit with donation + a psum'd global metric, run ONE step, and
assert the outputs bitwise-match the single-process vmap oracle.
"""
from __future__ import annotations

import sys


def main(n_devices: int) -> int:
    import jax

    try:
        # sitecustomize may have imported jax with an ambient (TPU) platform
        # default before our env was readable; backends are lazy, so forcing
        # CPU here still works as long as no device has been touched yet.
        jax.config.update("jax_platforms", "cpu")
    except Exception as exc:  # pragma: no cover - already-initialised backend
        print(f"dryrun: could not force cpu platform: {exc}", file=sys.stderr)
    import jax.numpy as jnp

    devs = jax.devices()
    if len(devs) < n_devices:
        print(
            f"dryrun: need {n_devices} devices, backend '{jax.default_backend()}' "
            f"has {len(devs)}",
            file=sys.stderr,
        )
        return 2

    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.parallel.mesh import (
        build_sharded_step,
        make_world_mesh,
        replicate_state,
        shard_world_batch,
    )

    # the FULL fused frame (transforms+cull+animation+physics+particles) —
    # the sharded step must cover every subsystem, not just the render path
    engine, world, *_ = demo_scenes.full_frame_world(
        num_entities=128, num_characters=4, num_bodies=8, particle_capacity=64)
    rmod = world.modules["renderer"]

    def extra(ws, dt):
        return rmod.cull_pass(ws, dt)

    step_raw = engine.build_step(world, extra=extra, jit=False)
    state = world.device_state()

    mesh = make_world_mesh(n_devices=n_devices)
    num_worlds = n_devices * 2
    dt = jnp.float32(1.0 / 60.0)
    batched = replicate_state(state, num_worlds, perturb_key=jax.random.PRNGKey(0))

    # single-process oracle (no mesh), for bitwise comparison
    oracle = jax.jit(jax.vmap(lambda s: step_raw(s, dt)))(batched)
    oracle_vis = int(jnp.sum(oracle.modules["renderer"].counters["visible_count"]))

    sharded = shard_world_batch(batched, mesh)
    stepv = build_sharded_step(step_raw, mesh, donate=True, with_metrics=True)
    out, metrics = stepv(sharded, dt)
    jax.block_until_ready((out, metrics))

    assert int(out.frame[0]) == 1, f"frame counter {int(out.frame[0])} != 1"
    vis_total = int(metrics["visible_total"])
    assert vis_total == oracle_vis, f"psum metric {vis_total} != oracle {oracle_vis}"
    ok = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: jnp.array_equal(a, b), out.world.pos, oracle.world.pos
        )
    )
    assert bool(ok), "sharded world positions diverge from vmap oracle"
    print(
        f"dryrun ok: {n_devices} devices, {num_worlds} worlds, "
        f"visible_total={vis_total}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 8))
