"""Model / skeleton resources (≙ reference renderer/model.{h,cpp}, pose.h).

A reference Model owns meshes+materials, a skeleton (bones with parent indices,
bind-pose transforms, SoA inverse-bind, model.cpp), ≤4 LODs with switch
distances (model.h LODMeshIndices), and a bounding sphere/AABB. The TPU build
keeps the same resource surface but bakes every loaded model into a **ModelBank**
— stacked, bone-padded device arrays — so animation sampling, pose compose and
skinning run batched over all instances of all models at once instead of
per-object virtual calls.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.core import host_math as hm

MAX_LODS = 4  # ≙ reference model.h


@dataclass
class Skeleton:
    """Host skeleton: parents sorted-ancestors-first is required (the reference
    guarantees this at import; we validate)."""

    bone_parent: np.ndarray  # int32 [B], -1 root
    bind_pos: np.ndarray     # f32 [B,3] local bind translation
    bind_rot: np.ndarray     # f32 [B,4] local bind rotation
    bone_names: List[str] = field(default_factory=list)

    def __post_init__(self):
        self.bone_parent = np.asarray(self.bone_parent, np.int32)
        self.bind_pos = np.asarray(self.bind_pos, np.float32)
        self.bind_rot = np.asarray(self.bind_rot, np.float32)
        if np.any(self.bone_parent >= np.arange(len(self.bone_parent))):
            raise ValueError("skeleton bones must be topologically sorted (parent < child)")

    @property
    def bone_count(self) -> int:
        return int(self.bone_parent.shape[0])

    def absolute_bind(self):
        """Model-space bind pose (host): compose down the chains."""
        b = self.bone_count
        abs_pos = np.zeros((b, 3), np.float32)
        abs_rot = np.zeros((b, 4), np.float32)
        for i in range(b):
            p = int(self.bone_parent[i])
            if p < 0:
                abs_pos[i], abs_rot[i] = self.bind_pos[i], self.bind_rot[i]
            else:
                one = np.ones(3, np.float32)
                abs_pos[i], abs_rot[i], _ = hm.compose(
                    abs_pos[p], abs_rot[p], one, self.bind_pos[i], self.bind_rot[i], one
                )
        return abs_pos, abs_rot

    def inverse_bind(self):
        """Inverse of the model-space bind pose (rigid): used to build skinning
        palettes (≙ model.cpp inverse bind SoA)."""
        abs_pos, abs_rot = self.absolute_bind()
        inv_rot = hm.quat_conjugate(abs_rot)
        inv_pos = hm.quat_rotate(inv_rot, -abs_pos)
        return inv_pos, inv_rot


@dataclass
class Model:
    """Host model resource."""

    name: str
    bounding_radius: float = 1.0
    lod_distances: Optional[np.ndarray] = None  # f32 [4], np.inf = unused (stored squared at bake)
    skeleton: Optional[Skeleton] = None
    vertex_positions: Optional[np.ndarray] = None  # f32 [V,3] (skinning/particle MESH sampling)
    vertex_uvs: Optional[np.ndarray] = None        # f32 [V,2] (bake-time texture sampling)
    vertex_triangles: Optional[np.ndarray] = None  # int32 [T,3] (physics trimesh cooking)
    vertex_bone: Optional[np.ndarray] = None       # int32 [V] dominant bone (simple rigid skinning)
    vertex_weights: Optional[np.ndarray] = None    # f32 [V,4] + vertex_bones [V,4] for LBS/DQS
    vertex_bones4: Optional[np.ndarray] = None     # int32 [V,4]
    material_id: int = 0
    mesh_id: int = 0

    def __post_init__(self):
        if self.lod_distances is None:
            self.lod_distances = np.full(MAX_LODS, np.inf, np.float32)


@struct.dataclass
class ModelBank:
    """Device-side stacked model data; leading axis = model id."""

    bounding_radius: jnp.ndarray   # f32 [M]
    lod_dist2: jnp.ndarray         # f32 [4,M] squared LOD switch distances (SoA)
    material_id: jnp.ndarray       # int32 [M]
    bone_count: jnp.ndarray        # int32 [M]
    bone_parent: jnp.ndarray       # int32 [M,B] (-1 pad/root)
    bind_pos: jnp.ndarray          # f32 [M,B,3] local bind
    bind_rot: jnp.ndarray          # f32 [M,B,4]
    inv_bind_pos: jnp.ndarray      # f32 [M,B,3] inverse of model-space bind
    inv_bind_rot: jnp.ndarray      # f32 [M,B,4]

    @property
    def num_models(self) -> int:
        return self.bounding_radius.shape[0]

    @property
    def max_bones(self) -> int:
        return self.bone_parent.shape[1]


class ModelRegistry:
    """Host registry: model name → id; bakes the ModelBank."""

    def __init__(self):
        self.models: List[Model] = []
        self._by_name: Dict[str, int] = {}

    def add(self, model: Model) -> int:
        if model.name in self._by_name:
            raise ValueError(f"duplicate model {model.name!r}")
        mid = len(self.models)
        self.models.append(model)
        self._by_name[model.name] = mid
        return mid

    def get_id(self, name: str) -> int:
        return self._by_name[name]

    def get(self, mid: int) -> Model:
        return self.models[mid]

    def __len__(self):
        return len(self.models)

    def bake(self, min_bones: int = 1) -> ModelBank:
        m = max(1, len(self.models))
        max_b = max([min_bones] + [mo.skeleton.bone_count for mo in self.models if mo.skeleton])
        radius = np.ones(m, np.float32)
        lod2 = np.full((m, MAX_LODS), np.inf, np.float32)
        mat = np.zeros(m, np.int32)
        bcount = np.zeros(m, np.int32)
        bparent = np.full((m, max_b), -1, np.int32)
        bpos = np.zeros((m, max_b, 3), np.float32)
        brot = np.tile(hm.QUAT_IDENTITY, (m, max_b, 1))
        ibpos = np.zeros((m, max_b, 3), np.float32)
        ibrot = np.tile(hm.QUAT_IDENTITY, (m, max_b, 1))
        for i, mo in enumerate(self.models):
            radius[i] = mo.bounding_radius
            ld = np.asarray(mo.lod_distances, np.float32)
            lod2[i] = np.where(np.isinf(ld), np.inf, ld * ld)
            mat[i] = mo.material_id
            if mo.skeleton is not None:
                b = mo.skeleton.bone_count
                bcount[i] = b
                bparent[i, :b] = mo.skeleton.bone_parent
                bpos[i, :b] = mo.skeleton.bind_pos
                brot[i, :b] = mo.skeleton.bind_rot
                ip, ir = mo.skeleton.inverse_bind()
                ibpos[i, :b] = ip
                ibrot[i, :b] = ir
        # host mirrors for trace-time consumers (ViewStatics et al) — a
        # device→host readback of bank fields costs ~seconds per array on
        # the tunneled TPU, and one readback PER COMPONENT made demo.unv's
        # prepare_statics take 78s (round-4 map-timeout postmortem)
        self.host_bounding_radius = radius
        self.host_lod_dist2 = lod2.T.copy()
        self.host_material_id = mat
        return ModelBank(
            bounding_radius=jnp.asarray(radius),
            lod_dist2=jnp.asarray(lod2.T.copy()),
            material_id=jnp.asarray(mat),
            bone_count=jnp.asarray(bcount),
            bone_parent=jnp.asarray(bparent),
            bind_pos=jnp.asarray(bpos),
            bind_rot=jnp.asarray(brot),
            inv_bind_pos=jnp.asarray(ibpos),
            inv_bind_rot=jnp.asarray(ibrot),
        )


def make_humanoid_skeleton(num_bones: int = 32, seed: int = 0) -> Skeleton:
    """Procedural test skeleton: a few chains off a root (spine, arms, legs) —
    stands in for FBX-imported skeletons in demos/benches."""
    rng = np.random.default_rng(seed)
    parent = np.full(num_bones, -1, np.int32)
    pos = np.zeros((num_bones, 3), np.float32)
    rot = np.tile(hm.QUAT_IDENTITY, (num_bones, 1))
    for i in range(1, num_bones):
        # chains: bone i attaches to a random earlier bone biased toward recent
        lo = max(0, i - 4)
        parent[i] = rng.integers(lo, i)
        pos[i] = rng.normal(0, 0.15, 3).astype(np.float32) + np.array([0, 0.25, 0], np.float32)
        axis = rng.normal(size=3).astype(np.float32)
        axis /= np.linalg.norm(axis)
        rot[i] = hm.quat_from_axis_angle(axis, rng.uniform(-0.3, 0.3))
    return Skeleton(bone_parent=parent, bind_pos=pos, bind_rot=rot,
                    bone_names=[f"bone{i}" for i in range(num_bones)])
