#!/usr/bin/env python
"""Per-subsystem timing probe for the full-frame bench config.

Builds full_frame_world variants and times the vmapped fori_loop step to
isolate where the frame budget goes (bench.py measures; this explains).
Usage: python tools/profile_frame.py [--worlds 1024] [--steps 30] \
          [--iters 12] [--ppp 4] [--bodies 64]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(args, solver_iterations, points_per_pair, broadphase="allpairs",
          sap_neighbors=16):
    from lumixengine_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.parallel.mesh import replicate_state

    engine, world, *_ = demo_scenes.full_frame_world(
        num_entities=args.entities,
        num_characters=args.characters,
        num_bodies=args.bodies,
        particle_capacity=args.particles,
    )
    pmod = world.modules["physics"]
    pmod.solver_iterations = solver_iterations
    pmod.points_per_pair = points_per_pair
    pmod.broadphase = broadphase
    pmod.sap_neighbors = sap_neighbors
    pmod.invalidate_statics()
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
            + jnp.sum(rs.counters["visible_count"]).astype(jnp.float32)
            + jnp.sum(state_b.modules["physics"].pos)
        )
        return state_b, probe

    key = jax.random.PRNGKey(0)
    state_b = replicate_state(state, args.worlds, perturb_key=key)
    state_b = jax.device_put(state_b)
    return run_steps, state_b


def timed(args, label, solver_iterations, points_per_pair, **kw):
    run_steps, state_b = build(args, solver_iterations, points_per_pair, **kw)
    dt = jnp.float32(1 / 60)
    state_b, probe = run_steps(state_b, dt, args.steps)  # compile+warm
    _ = float(probe)
    t0 = time.perf_counter()
    state_b, probe = run_steps(state_b, dt, args.steps)
    _ = float(probe)
    el = time.perf_counter() - t0
    rate = args.worlds * args.entities * args.steps / el
    print(f"{label:32s} elapsed={el:7.3f}s  rate={rate/1e6:8.1f}M/s")
    return el


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worlds", type=int, default=1024)
    p.add_argument("--entities", type=int, default=10240)
    p.add_argument("--characters", type=int, default=64)
    p.add_argument("--bodies", type=int, default=64)
    p.add_argument("--particles", type=int, default=2048)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()

    timed(args, "baseline iters=12 ppp=4", 12, 4)
    timed(args, "iters=1  ppp=4 (solver cost)", 1, 4)
    timed(args, "iters=12 ppp=1 (contact count)", 12, 1)
    timed(args, "iters=1  ppp=1", 1, 1)
    timed(args, "sap K=16 iters=12 ppp=4", 12, 4, broadphase="sap")
    timed(args, "sap K=8  iters=12 ppp=4", 12, 4, broadphase="sap", sap_neighbors=8)


if __name__ == "__main__":
    main()
