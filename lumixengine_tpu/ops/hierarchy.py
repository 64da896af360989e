"""Transform-hierarchy propagation as a level-order scan.

The reference propagates transforms eagerly: every World::setTransform recurses
depth-first over children on the spot (engine/world.cpp transformEntity),
driven by delegates. That shape is hostile to XLA (data-dependent recursion,
scattered writes), so this engine inverts it into a **per-frame dense pass**:
entities carry a precomputed hierarchy depth (roots are level 0, recomputed
host-side on topology change), and propagation walks the levels top-down, each
level one batched gather(parent) ∘ compose(local). Semantics match the
reference exactly: global = parent.global ∘ local with the non-associative SRT
compose, evaluated root→leaf; a root's global IS its local.

Two device paths:
  * ``propagate_indexed`` — the fast path. Level membership is static host
    data (per-level slot index arrays), so each level gathers/scatters ONLY its
    K_d entities: total data touched is O(N) instead of O(N·depth). Requires
    all worlds in a batch to share topology (they do: a world batch is one
    scene replicated with divergent dynamics, like vectorized RL envs).
  * ``propagate`` — masked full-N fallback where levels are runtime data
    (heterogeneous topologies in one batch).

All arrays use the TPU SoA layout (entity axis minor): see core/math.py.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lumixengine_tpu.core import transform as xf
from lumixengine_tpu.core.transform import Transform


def propagate(
    local: Transform,
    parent: jnp.ndarray,
    level: jnp.ndarray,
    max_depth: int,
) -> Transform:
    """Masked fallback path: derive global transforms from locals.

    local: Transform with lane axis = entity slot [.., C, N].
    parent: int32 [.., N] parent slot, -1 for roots.
    level: int32 [.., N] hierarchy depth, 0 = root.
    max_depth: static Python int (host-tracked deepest level).
    """
    parent_safe = jnp.maximum(parent, 0)
    world = local  # level 0: global = local
    if max_depth <= 0:
        return world

    def body(d, world):
        parent_t = xf.take(world, parent_safe)
        composed = xf.compose(parent_t, local)
        mask = level == d
        return xf.where(mask, composed, world)

    return jax.lax.fori_loop(1, max_depth + 1, body, world)


def propagate_indexed(
    local: Transform,
    parent: jnp.ndarray,
    level_indices: Sequence[np.ndarray],
) -> Transform:
    """Fast path: per-level static index arrays (levels 1..D, roots excluded).

    Each level d: gather the K_d entities' parents' packed transforms, compose
    with their locals, scatter back — O(sum K_d) = O(N) total traffic.
    """
    world = local.packed()  # [..., 10, N]
    local_packed = world
    for idx_np in level_indices:
        if len(idx_np) == 0:
            continue
        idx = jnp.asarray(np.asarray(idx_np, np.int32))
        pids = jnp.take(parent, idx, axis=-1)          # [..., K_d]
        parent_t = Transform.from_packed(jnp.take(world, pids, axis=-1))
        local_t = Transform.from_packed(jnp.take(local_packed, idx, axis=-1))
        new_packed = xf.compose(parent_t, local_t).packed()
        world = world.at[..., idx].set(new_packed)
    return Transform.from_packed(world)


def compute_levels_host(parent) -> Tuple[np.ndarray, int]:
    """Host-side level computation on topology change.

    Returns (level int32[N], max_depth). Dead/root slots (parent == -1) get
    level 0. Raises on cycles.
    """
    parent = np.asarray(parent, np.int32)
    n = parent.shape[0]
    level = np.zeros(n, np.int32)
    changed = True
    rounds = 0
    while changed:
        changed = False
        mask = parent >= 0
        new_level = np.where(mask, level[np.maximum(parent, 0)] + 1, 0)
        if not np.array_equal(new_level, level):
            level = new_level.astype(np.int32)
            changed = True
        rounds += 1
        if rounds > n + 1:
            raise ValueError("cycle detected in entity hierarchy")
    return level, int(level.max(initial=0))


def compute_level_indices_host(parent) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Returns (level, [idx_level_1, idx_level_2, ...]) — the static per-level
    slot arrays consumed by propagate_indexed (roots/level 0 excluded)."""
    level, max_depth = compute_levels_host(parent)
    indices = [np.nonzero(level == d)[0].astype(np.int32) for d in range(1, max_depth + 1)]
    return level, indices
