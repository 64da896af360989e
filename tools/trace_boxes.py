#!/usr/bin/env python
"""Trace the 10k-box SAP pipeline step (bench --config boxes)."""
from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--bodies", type=int, default=10000)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--neighbors", type=int, default=24)
    p.add_argument("--out", default="/tmp/jtrace_boxes")
    args = p.parse_args()

    from lumixengine_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lumixengine_tpu.ops import physics_big as PB
    from lumixengine_tpu.ops import physics_ops as P

    nb = args.bodies
    rng = np.random.default_rng(0)
    shape = np.full(nb, P.SHAPE_BOX, np.int32)
    radius = np.full(nb, 0.5, np.float32)
    he = np.full((3, nb), 0.5, np.float32)
    dyn = np.ones(nb, bool)
    inv_mass = np.ones(nb, np.float32)
    iib = np.tile(np.full((1, nb), 1.0 / (1.0 / 12 * 2.0), np.float32), (3, 1))
    fric = np.full(nb, 0.6, np.float32)
    rest = np.zeros(nb, np.float32)
    step = PB.make_big_world_step(shape, radius, he, dyn, inv_mass, iib, fric,
                                  rest, neighbors=args.neighbors)
    side = int(np.ceil(nb ** (1 / 3)))
    grid = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing="ij"), -1).reshape(-1, 3)[:nb]
    pos = jnp.asarray((grid * 1.1 + rng.uniform(0, 0.05, (nb, 3)) + [0.0, 2.0, 0.0]).T.astype(np.float32))
    rot = jnp.zeros((4, nb)).at[3].set(1.0)
    vel = jnp.zeros((3, nb))
    ang = jnp.zeros((3, nb))

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def run(carry, steps):
        def body(i, c):
            pos, rot, vel, ang, _ = step(c[0], c[1], c[2], c[3], jnp.float32(1 / 60))
            return (pos, rot, vel, ang, c[4])
        pos, rot, vel, ang, _ = jax.lax.fori_loop(0, steps, body, carry)
        return (pos, rot, vel, ang, jnp.int32(0)), jnp.sum(pos) + jnp.sum(vel)

    carry = (pos, rot, vel, ang, jnp.int32(0))
    carry, probe = run(carry, args.steps)
    _ = float(probe)
    shutil.rmtree(args.out, ignore_errors=True)
    with jax.profiler.trace(args.out):
        carry, probe = run(carry, args.steps)
        _ = float(probe)
    files = glob.glob(os.path.join(args.out, "**", "*.trace.json.gz"), recursive=True)
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    pids = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {pid for pid, name in pids.items() if "TPU" in name or "XLA" in name}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        tot[ev.get("name", "?")] += float(ev.get("dur", 0.0))
        cnt[ev.get("name", "?")] += 1
    for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{dur/1e3:9.2f} ms  {cnt[name]:5d}x  {name[:100]}")


if __name__ == "__main__":
    main()
