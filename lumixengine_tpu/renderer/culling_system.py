"""CullingSystem (≙ reference renderer/culling_system.{h,cpp}).

Reference: spatial hash of 300 m cells, each a linked list of 4 KB SoA sphere
pages; cull = jobs::forEach over cells with a 3-way test (cell fully inside →
bulk copy; intersecting → SIMD sphere test; outside → skip), per-entity
back-pointers for O(1) move/remove.

TPU: the cell structure exists to skip work on a scalar machine; on a vector
machine a dense masked test over all spheres is cheaper than the bookkeeping,
so the store is one fixed-capacity SoA array (entity, radius) and cull is the
kernel in ops/culling.py. The reference's "big object" special case and cell
fast paths collapse into the same dense pass. API surface matches: add /
remove / set_radius / is_added / cull.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.core.geometry import Frustum
from lumixengine_tpu.ops.culling import frustum_cull
from lumixengine_tpu.utils.store import DenseStore


@struct.dataclass
class CullingState:
    entity: jnp.ndarray  # int32 [K], -1 empty
    radius: jnp.ndarray  # f32 [K]


class CullingSystem:
    def __init__(self, capacity: int):
        self.store = DenseStore(capacity, {"radius": ((), np.float32, 1.0)})

    def add(self, entity: int, radius: float) -> None:
        self.store.add(entity, radius=np.float32(radius))

    def remove(self, entity: int) -> None:
        self.store.remove(entity)

    def is_added(self, entity: int) -> bool:
        return entity in self.store

    def set_radius(self, entity: int, radius: float) -> None:
        self.store.set(entity, "radius", np.float32(radius))

    def device_state(self, world=None) -> CullingState:
        d = self.store.device(world)
        return CullingState(entity=d["entity"], radius=d["radius"])


def cull(
    cs: CullingState,
    world_pos: jnp.ndarray,     # [3,N] entity world positions (SoA)
    world_scale: jnp.ndarray,   # [3,N] entity world scales (SoA)
    frustum: Frustum,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """→ visible bool [K]. Radius is scaled by the entity's max world scale
    (≙ reference cullingsystem radius follows absolute scale)."""
    eidx = jnp.maximum(cs.entity, 0)
    centers = jnp.take(world_pos, eidx, axis=-1)                      # [.., 3, K]
    max_scale = jnp.max(jnp.abs(jnp.take(world_scale, eidx, axis=-1)), axis=-2)
    radii = cs.radius * max_scale
    vis = frustum_cull(centers, radii, frustum, use_pallas=use_pallas)
    return vis & (cs.entity >= 0)
