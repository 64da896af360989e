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


class HierarchyPlan:
    """Static propagation schedule in topo-sorted slot space.

    The World assigns device slots in level order (all roots first, then level
    1, ...), so each level is a CONTIGUOUS segment and the parents of segment d
    are known host-side as a static position array into segment d-1. One level
    then costs: 1 static-index gather (parents) + 1 slice + 1
    dynamic_update_slice — no scatters, no device-side index data at all.
    """

    def __init__(self, segments):
        # segments: list of (start:int, end:int, parent_pos: np.int32[K_d]) for levels 1..D
        self.segments = [
            (int(s), int(e), np.asarray(p, np.int32)) for (s, e, p) in segments
        ]

    def __len__(self):
        return len(self.segments)

    def __eq__(self, other):
        return isinstance(other, HierarchyPlan) and len(self.segments) == len(other.segments) and all(
            s0 == s1 and e0 == e1 and np.array_equal(p0, p1)
            for (s0, e0, p0), (s1, e1, p1) in zip(self.segments, other.segments)
        )


def propagate_plan(local: Transform, plan: HierarchyPlan) -> Transform:
    """Fast path: propagate in topo-sorted slot space using a static plan.
    Roots' globals are their locals; each level composes its contiguous slice
    with statically-indexed parents.

    Field-wise (pos/rot/scale stay separate): the packed [10, N] form cost a
    full-buffer concatenate + slice-split per step (2×41 MB at the flagship
    — ~3 ms/step measured, tools/roofline.py trace); per-field updates touch
    the same level bytes without ever materializing the packed buffer."""
    pos, rot, scale = local.pos, local.rot, local.scale
    for start, end, ppos in plan.segments:
        if end <= start:
            continue
        pp = jnp.asarray(ppos)
        parent_t = Transform(pos=jnp.take(pos, pp, axis=-1),
                             rot=jnp.take(rot, pp, axis=-1),
                             scale=jnp.take(scale, pp, axis=-1))
        local_t = Transform(
            pos=jax.lax.slice_in_dim(pos, start, end, axis=pos.ndim - 1),
            rot=jax.lax.slice_in_dim(rot, start, end, axis=rot.ndim - 1),
            scale=jax.lax.slice_in_dim(scale, start, end, axis=scale.ndim - 1))
        new_t = xf.compose(parent_t, local_t)
        pos = jax.lax.dynamic_update_slice_in_dim(
            pos, new_t.pos, start, axis=pos.ndim - 1)
        rot = jax.lax.dynamic_update_slice_in_dim(
            rot, new_t.rot, start, axis=rot.ndim - 1)
        scale = jax.lax.dynamic_update_slice_in_dim(
            scale, new_t.scale, start, axis=scale.ndim - 1)
    return Transform(pos=pos, rot=rot, scale=scale)


def propagate_doubling(
    local: Transform,
    parent: jnp.ndarray,
    max_depth: int,
) -> Transform:
    """Pointer-jumping path: O(log depth) full-width rounds instead of one pass
    per level. Each round composes every node with its current ancestor-prefix
    and doubles the pointer. VALID ONLY for associative composition — SRT
    compose is associative iff scales are uniform (similarity transforms form a
    group; non-uniform scale + rotation does not). The World builder detects
    uniform-scale hierarchies host-side and selects this path.
    """
    import math as pymath

    if max_depth <= 0:
        return local
    world = local.packed()  # [..., 10, N]
    ptr = parent
    # after r rounds each node has composed its 2^r nearest ancestors
    rounds = max(1, pymath.ceil(pymath.log2(max_depth)))
    for _ in range(rounds):
        has = ptr >= 0
        pid = jnp.maximum(ptr, 0)
        parent_t = Transform.from_packed(jnp.take(world, pid, axis=-1))
        composed = xf.compose(parent_t, Transform.from_packed(world)).packed()
        world = jnp.where(has[..., None, :], composed, world)
        ptr = jnp.where(has, jnp.take(ptr, pid, axis=-1), ptr)
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
