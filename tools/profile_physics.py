#!/usr/bin/env python
"""Isolate physics frame cost: narrowphase vs solver prologue vs PGS loop.
Monkeypatches ops to skip stages at the bench config."""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp


def build(args, mode):
    from lumixengine_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lumixengine_tpu.models import demo_scenes
    from lumixengine_tpu.parallel.mesh import replicate_state
    from lumixengine_tpu.ops import physics_ops as P

    if mode == "nosolve":
        # contacts generated, solver skipped entirely
        def fake_solve(pos, rot, vel, angvel, contacts, *a, **k):
            keep = jnp.sum(contacts.depth * contacts.active, axis=-1) * 1e-9
            return vel + keep[..., None, None] * 0, angvel
        P_solve = P.solve_contacts
        P.solve_contacts = fake_solve
    elif mode == "nopairs":
        # no pair narrowphase: ground contacts only (solver on)
        P_pc = P.pair_contacts
        def fake_pairs(pos, rot, shape, radius, he, pa, pb, points_per_pair=4):
            c = P_pc(pos, rot, shape, radius, he, pa[:1], pb[:1],
                     points_per_pair=1)
            return c
        P.pair_contacts = fake_pairs

    engine, world, *_ = demo_scenes.full_frame_world(
        num_entities=args.entities, num_characters=args.characters,
        num_bodies=args.bodies, particle_capacity=args.particles)
    pmod = world.modules["physics"]
    if mode.startswith("sap"):
        pmod.broadphase = "sap"
        pmod.sap_neighbors = int(mode[3:] or 16)
        pmod.invalidate_statics()
    rmod = world.modules["renderer"]
    step_raw = engine.build_step(world, extra=lambda ws, dt: rmod.cull_pass(ws, dt),
                                 jit=False)
    state = world.device_state()

    @functools.partial(jax.jit, donate_argnums=0, static_argnums=2)
    def run_steps(state_b, dt, steps):
        def body(i, s):
            return jax.vmap(lambda w: step_raw(w, dt))(s)
        state_b = jax.lax.fori_loop(0, steps, body, state_b)
        probe = (jnp.sum(state_b.world.pos)
                 + jnp.sum(state_b.modules["physics"].pos)
                 + jnp.sum(state_b.modules["physics"].vel))
        return state_b, probe

    state_b = jax.device_put(replicate_state(state, args.worlds,
                                             perturb_key=jax.random.PRNGKey(0)))
    # force tracing+compile NOW so the monkeypatch is captured, then restore
    state_b, probe = run_steps(state_b, jnp.float32(1 / 60), args.steps)
    _ = float(probe)
    if mode == "nosolve":
        P.solve_contacts = P_solve
    elif mode == "nopairs":
        P.pair_contacts = P_pc
    return run_steps, state_b


def timed(args, label, mode):
    try:
        run_steps, state_b = build(args, mode)
        dt = jnp.float32(1 / 60)
        t0 = time.perf_counter()
        state_b, probe = run_steps(state_b, dt, args.steps)
        _ = float(probe)
        el = time.perf_counter() - t0
        print(f"{label:32s} elapsed={el:7.3f}s "
              f"rate={args.worlds*args.entities*args.steps/el/1e6:8.1f}M/s", flush=True)
    except Exception as ex:
        print(f"{label:32s} FAILED: {type(ex).__name__}: {str(ex)[:200]}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worlds", type=int, default=1024)
    p.add_argument("--entities", type=int, default=10240)
    p.add_argument("--characters", type=int, default=64)
    p.add_argument("--bodies", type=int, default=64)
    p.add_argument("--particles", type=int, default=2048)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--modes", default="nosolve,nopairs,sap8,sap16")
    args = p.parse_args()
    for mode in args.modes.split(","):
        timed(args, f"mode={mode}", mode)


if __name__ == "__main__":
    main()
