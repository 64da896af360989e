"""World: host-side scene builder + device-side WorldState pytree.

Reference design (engine/world.{h,cpp}): the World is SoA — parallel arrays of
EntityData and global Transforms deliberately split for cache behavior
(world.h m_entities/m_transforms), a freelist recycles destroyed slots
(world.cpp destroyEntity), hierarchy is a sparse side table of
parent/first_child/next_sibling + local transform, and component membership is
an archetype bitmask per entity (world.cpp archetypes; 44 component types,
engine cap MAX_TYPES_COUNT=64 in engine/lumix.h).

TPU re-architecture: the same SoA arrays, but split into two tiers:

* **host tier** (this class, numpy): structural, mutated by the scene API —
  create/destroy entity, set_parent, component membership. Structural edits are
  the slow path, exactly like the reference treats them.
* **device tier** (``WorldState``, jax): the per-frame simulation state — local
  transforms, derived global transforms, velocities, poses, particles — a pytree
  with **static capacity** that one jitted ``step`` consumes and returns
  (donated). Hierarchy is parent-index + precomputed depth level; propagation is
  the level scan in ops/hierarchy.py rather than the reference's eager
  recursion (world.cpp transformEntity).

Entity handles are plain ints (slot indices); -1 is invalid, matching the
reference's EntityPtr convention. Slots are recycled through a freelist with a
per-slot generation counter for staleness checks.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.core import host_math as hm
from lumixengine_tpu.core.transform import Transform
from lumixengine_tpu.ops import hierarchy as hier

INVALID_ENTITY = -1

# engine-wide component-type cap (≙ reference engine/lumix.h MAX_TYPES_COUNT = 64;
# archetype masks are a single u64)
MAX_COMPONENT_TYPES = 64


@struct.dataclass
class WorldState:
    """Device-side world snapshot — everything one frame of simulation touches.

    All arrays use the TPU SoA layout (core/math.py): component axis -2,
    entity/lane axis MINOR, entity slots in topo-sorted order (static
    capacity). Under ``vmap`` a leading world-batch axis is added per leaf.
    """

    alive: jnp.ndarray          # bool [N]
    parent: jnp.ndarray         # int32 [N], -1 = root / dead
    level: jnp.ndarray          # int32 [N] hierarchy depth (0 = root)
    # NOTE: the archetype bitmask (u64, ≙ reference world.cpp archetypes) is
    # HOST-tier only: modules carry their own entity columns, and u64 arrays
    # are pathological on TPU (emulated as u32 pairs; measured compile blowup).
    local: Transform            # [N] local (== global for roots)
    world: Transform            # [N] derived global
    modules: Dict[str, Any]     # per-module state pytrees, keyed by module name
    frame: jnp.ndarray          # int32 scalar frame counter
    time: jnp.ndarray           # float32 scalar accumulated sim time


class World:
    """Host-side scene container. Mirrors the reference World API surface
    (engine/world.h): createEntity, destroyEntity, setParent, setTransform,
    createComponent — but lowers to arrays instead of callbacks."""

    def __init__(self, capacity: int = 4096, allocator: Any = None):
        self.capacity = int(capacity)
        n = self.capacity
        self.alive = np.zeros(n, bool)
        self.parent = np.full(n, INVALID_ENTITY, np.int32)
        self.generation = np.zeros(n, np.int32)
        self.archetype = np.zeros(n, np.uint64)
        self.partition_of = np.zeros(n, np.int16)
        self.local_pos = np.zeros((n, 3), np.float32)
        self.local_rot = np.tile(hm.QUAT_IDENTITY, (n, 1))
        self.local_scale = np.ones((n, 3), np.float32)
        self.names: Dict[int, str] = {}
        self.partitions: List[str] = ["main"]
        self.active_partition = 0
        self._free: List[int] = list(range(n - 1, -1, -1))
        self._count = 0
        self._level = np.zeros(n, np.int32)
        self._level_indices: List[np.ndarray] = []
        self._max_depth = 0
        self._levels_dirty = True  # force initial slot build
        self._perm = np.arange(n, dtype=np.int32)
        self._slot_of = np.arange(n, dtype=np.int32)
        self._slot_level = np.zeros(n, np.int32)
        self._slot_parent = np.full(n, INVALID_ENTITY, np.int32)
        self._plan = hier.HierarchyPlan([])
        self.topology_version = 0
        # modules attached by Engine.create_world (name -> IModule instance)
        self.modules: Dict[str, Any] = {}
        # component type name -> (bit index, module)
        self.component_types: Dict[str, Any] = {}

    # -- entity lifecycle ---------------------------------------------------

    def create_entity(
        self,
        position=(0.0, 0.0, 0.0),
        rotation=hm.QUAT_IDENTITY,
        scale=(1.0, 1.0, 1.0),
        parent: int = INVALID_ENTITY,
        name: Optional[str] = None,
    ) -> int:
        if not self._free:
            raise RuntimeError(f"world capacity {self.capacity} exhausted")
        e = self._free.pop()
        self.alive[e] = True
        self.parent[e] = INVALID_ENTITY
        self.archetype[e] = 0
        self.partition_of[e] = self.active_partition
        self.local_pos[e] = np.asarray(position, np.float32)
        self.local_rot[e] = hm.quat_normalize(np.asarray(rotation, np.float32))
        self.local_scale[e] = np.asarray(scale, np.float32)
        self._count += 1
        if name is not None:
            self.names[e] = name
        if parent != INVALID_ENTITY:
            # position/rotation given are interpreted as LOCAL when parent passed at creation
            self.parent[e] = parent
            self._levels_dirty = True
        else:
            self._level[e] = 0
        return e

    def destroy_entity(self, e: int) -> None:
        if not self.alive[e]:
            return
        # reparent children to root, keeping their global transform
        # (≙ reference world.cpp destroyEntity → setParent(INVALID, child))
        for c in np.nonzero(self.parent == e)[0]:
            self.set_parent(int(c), INVALID_ENTITY)
        for name, (bit, module) in list(self.component_types.items()):
            if self.archetype[e] & np.uint64(1 << bit):
                module.destroy_component(e, name)
        self.alive[e] = False
        self.parent[e] = INVALID_ENTITY
        self.archetype[e] = 0
        self.generation[e] += 1
        self.names.pop(e, None)
        self._free.append(e)
        self._count -= 1
        self._levels_dirty = True

    @property
    def entity_count(self) -> int:
        return self._count

    def is_alive(self, e: int) -> bool:
        return 0 <= e < self.capacity and bool(self.alive[e])

    # -- hierarchy ------------------------------------------------------------

    def set_parent(self, child: int, parent: int) -> None:
        """Reparent, preserving the child's GLOBAL transform
        (≙ reference world.cpp setParent → computeLocalTransform)."""
        if parent != INVALID_ENTITY:
            p = parent
            while p != INVALID_ENTITY:
                if p == child:
                    raise ValueError("hierarchy cycle")
                p = int(self.parent[p])
        g_pos, g_rot, g_scale = self.get_global_transform(child)
        self.parent[child] = parent
        if parent == INVALID_ENTITY:
            self.local_pos[child], self.local_rot[child], self.local_scale[child] = g_pos, g_rot, g_scale
        else:
            pp, pr, ps = self.get_global_transform(parent)
            self.local_pos[child], self.local_rot[child], self.local_scale[child] = hm.compute_local(
                pp, pr, ps, g_pos, g_rot, g_scale
            )
        self._levels_dirty = True

    def get_parent(self, e: int) -> int:
        return int(self.parent[e])

    def children_of(self, e: int) -> List[int]:
        return [int(c) for c in np.nonzero(self.parent == e)[0]]

    def _refresh_levels(self) -> None:
        if not self._levels_dirty:
            return
        self._level, self._level_indices = hier.compute_level_indices_host(self.parent)
        self._max_depth = len(self._level_indices)
        self._rebuild_slots()
        self._levels_dirty = False

    def _rebuild_slots(self) -> None:
        """Recompute the topo-sorted slot permutation + static propagation plan.

        Device slots are assigned in level order (roots first, then level 1,
        ...) so hierarchy propagation touches only contiguous segments with
        static parent positions — see ops/hierarchy.py HierarchyPlan.
        """
        n = self.capacity
        order = np.argsort(self._level, kind="stable").astype(np.int32)  # slot -> entity
        self._perm = order
        self._slot_of = np.empty(n, np.int32)
        self._slot_of[order] = np.arange(n, dtype=np.int32)
        self._slot_level = self._level[order]
        # slot-space parent indices (-1 for roots/dead)
        pe = self.parent[order]
        self._slot_parent = np.where(pe >= 0, self._slot_of[np.maximum(pe, 0)], -1).astype(np.int32)
        self.topology_version += 1
        segments = []
        for d in range(1, self._max_depth + 1):
            idx = np.nonzero(self._slot_level == d)[0]
            if idx.size == 0:
                continue
            start, end = int(idx[0]), int(idx[-1]) + 1
            segments.append((start, end, self._slot_parent[start:end]))
        self._plan = hier.HierarchyPlan(segments)

    @property
    def max_depth(self) -> int:
        self._refresh_levels()
        return self._max_depth

    @property
    def level_indices(self) -> List[np.ndarray]:
        """Static per-level ENTITY-id arrays for ops.hierarchy.propagate_indexed
        (entity-ordered states; the plan path below is faster)."""
        self._refresh_levels()
        return self._level_indices

    @property
    def plan(self) -> "hier.HierarchyPlan":
        """Static propagation plan in topo-sorted slot space."""
        self._refresh_levels()
        return self._plan

    def slot(self, e: int) -> int:
        """Device slot of an entity (device arrays are topo-sorted)."""
        self._refresh_levels()
        return int(self._slot_of[e])

    def to_slots(self, entities: np.ndarray) -> np.ndarray:
        """Translate entity-id arrays (−1 preserved) into device slots — used
        by module stores when snapshotting their entity columns."""
        self._refresh_levels()
        e = np.asarray(entities, np.int32)
        return np.where(e >= 0, self._slot_of[np.maximum(e, 0)], -1).astype(np.int32)

    def hierarchy_is_uniform_scale(self) -> bool:
        """True when every entity involved in a parent/child relation has a
        uniform (isotropic) scale — SRT compose is then associative and the
        O(log depth) pointer-doubling propagate is exact."""
        involved = self.parent >= 0
        parents = self.parent[involved]
        if parents.size:
            involved = involved.copy()
            involved[parents] = True
        s = self.local_scale[involved]
        if s.size == 0:
            return True
        return bool(np.allclose(s[:, 0:1], s, rtol=0.0, atol=1e-6))

    # -- transforms (host eager path, for scene building / queries) -----------

    def get_local_transform(self, e: int):
        return self.local_pos[e].copy(), self.local_rot[e].copy(), self.local_scale[e].copy()

    def set_local_transform(self, e: int, position=None, rotation=None, scale=None) -> None:
        if position is not None:
            self.local_pos[e] = np.asarray(position, np.float32)
        if rotation is not None:
            self.local_rot[e] = hm.quat_normalize(np.asarray(rotation, np.float32))
        if scale is not None:
            self.local_scale[e] = np.asarray(scale, np.float32)

    def get_global_transform(self, e: int):
        """Walk the parent chain (host path; the device path is ops/hierarchy).

        Composed top-down (root → entity) like the reference's transformEntity:
        SRT compose with non-uniform scale is not associative, so order matters.
        """
        chain = [e]
        p = int(self.parent[e])
        while p != INVALID_ENTITY:
            chain.append(p)
            p = int(self.parent[p])
        root = chain[-1]
        pos = self.local_pos[root].copy()
        rot = self.local_rot[root].copy()
        scale = self.local_scale[root].copy()
        for c in reversed(chain[:-1]):
            pos, rot, scale = hm.compose(
                pos, rot, scale, self.local_pos[c], self.local_rot[c], self.local_scale[c]
            )
        return pos, rot, scale

    def set_global_transform(self, e: int, position=None, rotation=None, scale=None) -> None:
        """Set global; stores the equivalent local (≙ world.cpp setTransform)."""
        g_pos, g_rot, g_scale = self.get_global_transform(e)
        if position is not None:
            g_pos = np.asarray(position, np.float32)
        if rotation is not None:
            g_rot = hm.quat_normalize(np.asarray(rotation, np.float32))
        if scale is not None:
            g_scale = np.asarray(scale, np.float32)
        p = int(self.parent[e])
        if p == INVALID_ENTITY:
            self.local_pos[e], self.local_rot[e], self.local_scale[e] = g_pos, g_rot, g_scale
        else:
            pp, pr, ps = self.get_global_transform(p)
            self.local_pos[e], self.local_rot[e], self.local_scale[e] = hm.compute_local(
                pp, pr, ps, g_pos, g_rot, g_scale
            )

    set_position = lambda self, e, p: self.set_global_transform(e, position=p)  # noqa: E731
    set_rotation = lambda self, e, r: self.set_global_transform(e, rotation=r)  # noqa: E731
    set_scale = lambda self, e, s: self.set_global_transform(e, scale=s)  # noqa: E731

    # -- names / partitions ----------------------------------------------------

    def set_entity_name(self, e: int, name: str) -> None:
        self.names[e] = name

    def get_entity_name(self, e: int) -> str:
        return self.names.get(e, "")

    def find_by_name(self, name: str) -> int:
        for e, n in self.names.items():
            if n == name and self.alive[e]:
                return e
        return INVALID_ENTITY

    def create_partition(self, name: str) -> int:
        """≙ World::createPartition; new entities tag with active_partition."""
        self.partitions.append(name)
        return len(self.partitions) - 1

    def set_active_partition(self, p: int) -> None:
        self.active_partition = int(p)

    def destroy_partition(self, p: int) -> int:
        """≙ World::destroyPartition: destroy every entity tagged with the
        partition (the streaming unload half of World::load). Returns the
        number destroyed; partition ids stay stable (names keep their row)."""
        doomed = [e for e in range(self.capacity)
                  if self.alive[e] and int(self.partition_of[e]) == int(p)]
        for e in doomed:
            self.destroy_entity(e)
        if self.active_partition == int(p):
            self.active_partition = 0
        return len(doomed)

    # -- components -------------------------------------------------------------

    def register_component_type(self, name: str, module) -> int:
        if name in self.component_types:
            raise ValueError(f"component type {name!r} already registered")
        bit = len(self.component_types)
        if bit >= MAX_COMPONENT_TYPES:
            raise RuntimeError("MAX_COMPONENT_TYPES exceeded")
        self.component_types[name] = (bit, module)
        return bit

    def create_component(self, e: int, ctype: str, **props):
        bit, module = self.component_types[ctype]
        if self.archetype[e] & np.uint64(1 << bit):
            raise ValueError(f"entity {e} already has component {ctype!r}")
        out = module.create_component(e, ctype, **props)
        self.archetype[e] |= np.uint64(1 << bit)
        return out

    def destroy_component(self, e: int, ctype: str) -> None:
        bit, module = self.component_types[ctype]
        if not (self.archetype[e] & np.uint64(1 << bit)):
            return
        module.destroy_component(e, ctype)
        self.archetype[e] &= ~np.uint64(1 << bit)

    def has_component(self, e: int, ctype: str) -> bool:
        bit, _ = self.component_types[ctype]
        return bool(self.archetype[e] & np.uint64(1 << bit))

    def get_module(self, name: str):
        return self.modules[name]

    # -- device state bridge ------------------------------------------------------

    def device_state(self) -> WorldState:
        """Snapshot host arrays into the device pytree one jitted step consumes.

        Two layout flips vs host arrays: (1) component-major [3,N] (TPU lane
        layout, see core/math.py); (2) entity axis in TOPO-SORTED slot order so
        hierarchy propagation runs on contiguous level segments with a fully
        static plan. Module stores translate their entity columns to slots via
        World.to_slots.
        """
        self._refresh_levels()
        p = self._perm
        import jax

        # Build the whole snapshot on the CPU backend, then ship it in ONE
        # batched device_put. Building it eagerly on the accelerator costs a
        # tunnel round trip per jnp op and a REMOTE compile per unique tiny
        # eager shape — ~400s of setup for demo.unv (round-4 map-timeout
        # postmortem); on local CPU the same composition is <2s.
        try:
            host = jax.local_devices(backend="cpu")[0]
        except Exception:  # cpu backend disabled — build on the default device
            host = jax.devices()[0]
        with jax.default_device(host):
            local = Transform(
                pos=jnp.asarray(self.local_pos[p].T.copy()),
                rot=jnp.asarray(self.local_rot[p].T.copy()),
                scale=jnp.asarray(self.local_scale[p].T.copy()),
            )
            world = hier.propagate_plan(local, self._plan)
            state = WorldState(
                alive=jnp.asarray(self.alive[p]),
                parent=jnp.asarray(self._slot_parent),
                level=jnp.asarray(self._slot_level),
                local=local,
                world=world,
                modules={name: m.device_state() for name, m in self.modules.items()},
                frame=jnp.int32(0),
                time=jnp.float32(0.0),
            )
        dev = jax.devices()[0]
        if dev.platform == "cpu":
            return state
        return jax.device_put(state, dev)

    def load_state(self, state: WorldState, slot_of=None, skip=None) -> None:
        """Copy a device snapshot's per-frame fields back to host (save path).

        slot_of: entity→slot permutation matching `state` — pass the one
        captured at snapshot time when the topology has changed since (script
        structural edits); defaults to the current permutation.
        skip: entity ids whose HOST values are newer than the snapshot
        (script transform writes this frame) — left untouched.
        """
        if slot_of is None:
            self._refresh_levels()
            slot_of = self._slot_of
        inv = np.asarray(slot_of)
        pos = np.asarray(state.local.pos).T[inv]
        rot = np.asarray(state.local.rot).T[inv]
        scale = np.asarray(state.local.scale).T[inv]
        # only entities that existed in the snapshot carry meaningful columns
        alive_then = np.asarray(state.alive)[inv]
        keep = alive_then.copy()
        if skip:
            keep[list(skip)] = False
        self.local_pos[keep] = pos[keep]
        self.local_rot[keep] = rot[keep]
        self.local_scale[keep] = scale[keep]
        for name, m in self.modules.items():
            if hasattr(m, "load_state") and name in state.modules:
                m.load_state(state.modules[name])
