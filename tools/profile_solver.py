#!/usr/bin/env python
"""Microbenchmark solve_contacts alone at the full-frame bench shapes:
W=1024 worlds, NB=64 bodies, C=8320 contacts. Sweeps iterations and pieces."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.ops import physics_ops as P
from lumixengine_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

W, NB, PPP = 1024, 64, 4
rng = np.random.default_rng(0)
ii, jj = np.triu_indices(NB, k=1)
pair_a, pair_b = ii.astype(np.int32), jj.astype(np.int32)
gnd_ba = np.tile(np.arange(NB, dtype=np.int32), 4)
body_a = np.concatenate([gnd_ba, np.tile(pair_a, PPP)])
body_b = np.concatenate([np.full(4 * NB, -1, np.int32), np.tile(pair_b, PPP)])
C = body_a.shape[0]
print(f"W={W} NB={NB} C={C}")

inc_a = np.zeros((NB, C), np.float32)
inc_a[body_a, np.arange(C)] = 1.0
inc_b = np.zeros((NB, C), np.float32)
vb_ = body_b >= 0
inc_b[np.maximum(body_b, 0)[vb_], np.nonzero(vb_)[0]] = 1.0

inv_mass = np.ones(NB, np.float32)
iiw = jnp.asarray(np.tile(np.ones((1, 3, 1), np.float32), (W, 1, NB)))
fric = np.full(C, 0.5, np.float32)
rest = np.zeros(C, np.float32)

contacts = P.Contacts(
    body_a=body_a, body_b=body_b,
    point=jnp.asarray(rng.standard_normal((W, 3, C)).astype(np.float32)),
    normal=jnp.asarray(np.tile(np.array([0, 1, 0], np.float32)[None, :, None], (W, 1, C))),
    depth=jnp.asarray(rng.uniform(-0.5, 0.01, (W, C)).astype(np.float32)),
    active=jnp.asarray(rng.uniform(0, 1, (W, C)) < 0.04),
)
pos = jnp.asarray(rng.standard_normal((W, 3, NB)).astype(np.float32))
rot = jnp.zeros((W, 4, NB)).at[:, 3].set(1.0)
vel = jnp.asarray(rng.standard_normal((W, 3, NB)).astype(np.float32))
ang = jnp.asarray(rng.standard_normal((W, 3, NB)).astype(np.float32))


def timed(label, fn, *args):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    # force readback through a probe
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args)
    probe = float(jnp.sum(out[0]) + jnp.sum(out[1]))
    el = (time.perf_counter() - t0) / 10
    print(f"{label:36s} {el*1e3:8.2f} ms/call   probe={probe:.3f}", flush=True)


for iters in (1, 2, 4, 8, 12):
    timed(f"solve iters={iters}",
          functools.partial(P.solve_contacts, iterations=iters),
          pos, rot, vel, ang, contacts, inv_mass, iiw, inc_a, inc_b,
          jnp.float32(1 / 60), fric, rest)
