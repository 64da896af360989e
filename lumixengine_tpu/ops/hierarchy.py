"""Transform-hierarchy propagation as a level-order scan.

The reference propagates transforms eagerly: every World::setTransform recurses
depth-first over children on the spot (engine/world.cpp transformEntity), driven
by delegates. That shape is hostile to XLA (data-dependent recursion, scattered
writes), so this engine inverts it into a **per-frame dense pass**: entities carry
a precomputed hierarchy depth (``level``; roots are level 0, computed host-side on
topology change), and propagation is a ``lax.fori_loop`` over depths where each
iteration does one masked gather(parent) ∘ compose(local) over the whole entity
array. Work per level is O(N) VPU-parallel; total depth is the tree height, which
for game scenes is small (≤ ~16).

Semantics match the reference: global = parent.global ∘ local with the SRT
compose of core/math.cpp Transform::compose; a root's global IS its local
(world.cpp transformEntity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lumixengine_tpu.core import transform as xf
from lumixengine_tpu.core.transform import Transform


def propagate(
    local: Transform,
    parent: jnp.ndarray,
    level: jnp.ndarray,
    max_depth: int,
) -> Transform:
    """Derive global transforms from locals.

    Args:
      local: batched Transform, leading axis = entity slot.
      parent: int32 [N] parent slot index, -1 for roots (dead slots point at -1).
      level: int32 [N] hierarchy depth, 0 = root.
      max_depth: static Python int — the deepest level present (host-tracked).

    Returns:
      global Transform [N].
    """
    parent_safe = jnp.maximum(parent, 0)

    # level 0: global = local
    world = local

    if max_depth <= 0:
        return world

    def body(d, world):
        parent_t = xf.gather(world, parent_safe)
        composed = xf.compose(parent_t, local)
        mask = level == d
        return xf.where(mask, composed, world)

    # each iteration only commits entities at depth d; parents (depth < d) are final
    return jax.lax.fori_loop(1, max_depth + 1, body, world)


def propagate_subtree(
    local: Transform,
    parent: jnp.ndarray,
    level: jnp.ndarray,
    max_depth: int,
    world_prev: Transform,
    dirty_root: jnp.ndarray,
) -> Transform:
    """Variant used by interactive edits: recompute only entities whose root-path
    contains a dirty entity. dirty flags flow down the same level scan."""
    parent_safe = jnp.maximum(parent, 0)
    dirty = dirty_root
    world = xf.where((level == 0) & dirty, local, world_prev)

    def body(d, carry):
        world, dirty = carry
        at_d = level == d
        parent_dirty = dirty[parent_safe]
        new_dirty = jnp.where(at_d, parent_dirty | dirty, dirty)
        parent_t = xf.gather(world, parent_safe)
        composed = xf.compose(parent_t, local)
        world = xf.where(at_d & new_dirty, composed, world)
        return world, new_dirty

    world, _ = jax.lax.fori_loop(1, max_depth + 1, body, (world, dirty))
    return world


def compute_levels_host(parent) -> tuple:
    """Host-side (numpy) level computation on topology change.

    Returns (level int32[N], max_depth int). Dead/root slots (parent == -1)
    get level 0. Raises on cycles.
    """
    import numpy as np

    parent = np.asarray(parent, np.int32)
    n = parent.shape[0]
    level = np.zeros(n, np.int32)
    # iterative: level[i] = level[parent[i]] + 1, resolved by repeated relaxation
    # over at most n rounds; O(n * depth) but host-side and only on topology change.
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
