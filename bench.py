#!/usr/bin/env python
"""Benchmark harness — the driver runs this on real TPU hardware.

Config: the "full fused frame" from BASELINE.md — W vmapped worlds × N entities,
one jitted donated step per frame (transform hierarchy propagation + frustum
cull + whatever subsystems are wired into the fused step: animation, physics,
particles as they land). Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is value / 1e8 entity-steps/sec/chip (the BASELINE.json target; the
reference publishes no numbers — see BASELINE.md).

Measurement notes: this TPU is reached through a tunnel where
``block_until_ready`` does not reliably block and full-buffer readbacks are
slow, so the step loop runs INSIDE one jitted ``lax.fori_loop`` and completion
is forced by reading back a 4-byte probe that data-depends on every subsystem's
output (also defeats dead-code elimination). This matches the production shape
anyway: no host sync inside the frame loop (SURVEY.md §7.8).
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp


def build(args):
    from lumixengine_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.renderer import pipeline as pipe
    from lumixengine_tpu.parallel.mesh import replicate_state

    engine, world, renderer = demo_scenes.headless_demo_world(num_entities=args.entities)
    rmod = world.modules["renderer"]

    def extra(ws, dt):
        return rmod.cull_pass(ws, dt)

    step_raw = engine.build_step(world, extra=extra, jit=False)
    state = world.device_state()

    @functools.partial(jax.jit, donate_argnums=0, static_argnums=2)
    def run_steps(state_b, dt, steps):
        def body(i, s):
            return jax.vmap(lambda w: step_raw(w, dt))(s)

        state_b = jax.lax.fori_loop(0, steps, body, state_b)
        rs = state_b.modules["renderer"]
        probe = (
            jnp.sum(state_b.world.pos)
            + jnp.sum(rs.counters["visible_count"])
            + jnp.sum(rs.prev_pos)
            + jnp.sum(state_b.local.pos)
        )
        return state_b, probe

    key = jax.random.PRNGKey(0)
    state_b = replicate_state(state, args.worlds, perturb_key=key)
    state_b = jax.device_put(state_b)
    return run_steps, state_b


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worlds", type=int, default=4096)
    p.add_argument("--entities", type=int, default=10240)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--dt", type=float, default=1.0 / 60.0)
    args = p.parse_args()

    run_steps, state_b = build(args)
    dt = jnp.float32(args.dt)

    # warmup: compile + one full run
    state_b, probe = run_steps(state_b, dt, args.steps)
    _ = float(probe)

    t0 = time.perf_counter()
    state_b, probe = run_steps(state_b, dt, args.steps)
    _ = float(probe)
    elapsed = time.perf_counter() - t0

    entity_steps = args.worlds * args.entities * args.steps
    value = entity_steps / elapsed
    print(
        json.dumps(
            {
                "metric": "entity_steps_per_sec_per_chip",
                "value": value,
                "unit": "entity-steps/s",
                "vs_baseline": value / 1e8,
                "config": {
                    "worlds": args.worlds,
                    "entities": args.entities,
                    "steps": args.steps,
                    "elapsed_s": round(elapsed, 4),
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
