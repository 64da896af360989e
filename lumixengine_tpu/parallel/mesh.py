"""Multi-chip scaling (≙ SURVEY.md §2.7/§2.8 — the reference has no distributed
backend; its parallelism inventory maps to XLA as documented there).

Design: worlds are embarrassingly parallel (one World = one independent game),
so the batch of worlds is sharded across chips over a 1-D mesh axis "worlds" —
pure data parallelism over ICI, with `psum` only for global metrics, exactly
the mapping SURVEY.md §2.7 prescribes. Within a chip, XLA's op-level
parallelism replaces the reference's fiber job system.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

WORLD_AXIS = "worlds"


def make_world_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (WORLD_AXIS,))


def shard_world_batch(batched_state, mesh: Mesh):
    """Place a world-batched state pytree with its leading axis sharded over
    the mesh's world axis."""
    sharding = NamedSharding(mesh, P(WORLD_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batched_state)


def build_sharded_step(
    step_fn: Callable,
    mesh: Mesh,
    donate: bool = True,
    with_metrics: bool = False,
):
    """Lift a single-world ``step(state, dt) -> state`` to a sharded batched
    step over the mesh. Worlds within a shard are vmapped; shards run SPMD via
    shard_map. When ``with_metrics``, the step also returns a globally psum'd
    metrics dict (frame counters) — the only cross-chip communication the
    engine needs (SURVEY.md §2.8).
    """

    def local_step(batched_state, dt):
        out = jax.vmap(lambda s: step_fn(s, dt))(batched_state)
        if not with_metrics:
            return out
        # global metric reduction over ICI (visible renderables across all worlds)
        vis = out.modules.get("renderer")
        local_visible = (
            jnp.sum(vis.counters["visible_count"]) if vis is not None else jnp.int32(0)
        )
        metrics = {"visible_total": jax.lax.psum(local_visible, WORLD_AXIS)}
        return out, metrics

    spec_in = P(WORLD_AXIS)
    out_specs = (P(WORLD_AXIS), P()) if with_metrics else P(WORLD_AXIS)
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec_in, P()),
        out_specs=out_specs,
        check_vma=False,
    )
    if donate:
        return jax.jit(fn, donate_argnums=0)
    return jax.jit(fn)


def _replicate_body(state, perturb_key, num_worlds: int):
    batched = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_worlds,) + x.shape), state
    )
    if perturb_key is not None:
        kp, kv, kw, ks = jax.random.split(perturb_key, 4)
        noise = jax.random.normal(kp, (num_worlds,) + state.local.pos.shape) * 0.01
        batched = batched.replace(
            local=batched.local.replace(pos=batched.local.pos + noise)
        )
        pm = batched.modules.get("physics")
        if pm is not None and hasattr(pm, "vel"):
            vel = pm.vel + jax.random.normal(kv, pm.vel.shape) * 0.05
            ang = pm.angvel + jax.random.normal(kw, pm.angvel.shape) * 0.05
            pms = pm.replace(vel=vel, angvel=ang)
            if hasattr(pm, "sleep"):
                # make worlds cross the sleep boundary on different frames:
                # seed the calm-frame counters FORWARD with random values
                # below the threshold (a backward stagger from 0 was a no-op
                # on fresh states — ADVICE-r4 low)
                stag = jax.random.randint(ks, pm.sleep.shape, 0, 16,
                                          dtype=pm.sleep.dtype)
                pms = pms.replace(sleep=jnp.maximum(pm.sleep, stag))
            batched = batched.replace(
                modules={**batched.modules, "physics": pms})
    return batched


_replicate_jit = jax.jit(_replicate_body, static_argnums=2)


def replicate_state(state, num_worlds: int, perturb_key: Optional[jax.Array] = None):
    """Tile a single-world state into a world batch, ON DEVICE in one jitted
    program. If a key is given, the worlds are made to DIVERGE, not just
    shift: local positions, physics velocities/angular velocities AND sleep
    counters get per-world perturbations, so benches measure truly
    independent dynamics (divergent contact sets, sleeping masks, branch
    outcomes) rather than 4096 copies of one trajectory (VERDICT-r3 weak #8).

    Jitted on purpose: eager per-leaf broadcasts were dozens of remote
    round-trips through the TPU tunnel (seconds each); this uploads the
    1-world state once and expands it device-side (tpu-tunnel-costs)."""
    return _replicate_jit(state, perturb_key, num_worlds)
