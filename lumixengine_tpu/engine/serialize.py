"""World serialization — the save system (≙ reference engine/world.cpp
serialize/deserialize + engine.cpp project (de)serialization).

Reference: World::serialize writes entities/transforms/names/hierarchy/
partitions plus each module's independently-versioned blob, LZ4-compressed
with stored raw/compressed sizes (world.cpp); deserialize supports versioned
migration (WorldVersion enum) and entity remapping via EntityMap so prefabs
and additive loads rebase entity ids (world.h EntityMap).

TPU build: the same structure — a versioned header, world core arrays, one
versioned blob per module — packed as npz-style arrays + a JSON manifest,
compressed with the native LZ4-style codec (utils/native, C++) when built,
zlib otherwise. Device state (a WorldState snapshot) is a pytree of arrays and
can be saved alongside for exact sim-state checkpoint/resume (SURVEY.md §5).

Prefabs (≙ engine/prefab.h + editor PrefabSystem): a prefab is the same
serialized fragment restricted to an entity subset; instantiation deserializes
with an EntityMap that rebases ids onto freshly created entities.
"""
from __future__ import annotations

import io
import json
import struct as pystruct
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

MAGIC = b"LXTPUW"
WORLD_VERSION = 1  # bump + add a _migrate_vN step on format change


class EntityMap:
    """Old entity id → new id (≙ world.h EntityMap)."""

    def __init__(self):
        self.map: Dict[int, int] = {}

    def get(self, old: int) -> int:
        if old < 0:
            return -1
        return self.map.get(old, -1)

    def set(self, old: int, new: int) -> None:
        self.map[old] = new


# -- compression --------------------------------------------------------------


def _compress(data: bytes) -> tuple:
    try:
        from lumixengine_tpu.utils import native

        if native.available():
            return b"lz4n", native.lz4_compress(data)
    except Exception:
        pass
    import zlib

    return b"zlib", zlib.compress(data, 6)


def _decompress(codec: bytes, data: bytes, raw_size: int) -> bytes:
    if codec == b"lz4n":
        from lumixengine_tpu.utils import native

        return native.lz4_decompress(data, raw_size)
    import zlib

    return zlib.decompress(data)


# -- payload encoding -----------------------------------------------------------


def _pack_payload(manifest: dict, arrays: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    arr_bytes = buf.getvalue()
    mani = json.dumps(manifest).encode()
    return pystruct.pack("<II", len(mani), len(arr_bytes)) + mani + arr_bytes


def _unpack_payload(data: bytes):
    mlen, alen = pystruct.unpack_from("<II", data, 0)
    off = 8
    manifest = json.loads(data[off : off + mlen].decode())
    arrays = dict(np.load(io.BytesIO(data[off + mlen : off + mlen + alen]), allow_pickle=False))
    return manifest, arrays


# -- module component dump/restore ------------------------------------------------


def _dump_module_components(module) -> List[dict]:
    """Generic component dump using the module's COMPONENT_STORES mapping;
    modules may override serialize_components() for custom wiring."""
    from lumixengine_tpu.utils.store import dump_stores

    if hasattr(module, "serialize_components"):
        return module.serialize_components()
    return dump_stores(module)


_ENTITY_PROPS = {"body_a", "body_b", "ent_a", "ent_b", "target_entity", "parent_entity"}


def _restore_component(world, comp: dict, emap: EntityMap) -> None:
    e = emap.get(comp["entity"])
    if e < 0:
        return
    props = dict(comp["props"])
    ctype = comp["type"]
    # remap entity-reference properties
    for k in list(props.keys()):
        if k in _ENTITY_PROPS:
            props[k] = emap.get(int(props[k]))
    if ctype == "distance_joint":
        props = {"body_a": props["ent_a"], "body_b": props["ent_b"],
                 "length": props["length"]}
    world.create_component(e, ctype, **props)


# -- world save / load --------------------------------------------------------------


def serialize_world(world, entities: Optional[Sequence[int]] = None) -> bytes:
    """Serialize the whole world (or an entity subset → prefab fragment)."""
    subset = None if entities is None else set(int(e) for e in entities)
    ids = [
        e for e in range(world.capacity)
        if world.alive[e] and (subset is None or e in subset)
    ]
    idx = np.asarray(ids, np.int32)
    parent = world.parent[idx]
    # parents outside the subset become roots (prefab semantics)
    if subset is not None:
        parent = np.where(np.isin(parent, idx), parent, -1).astype(np.int32)

    arrays = {
        "ids": idx,
        "parent": parent,
        "local_pos": world.local_pos[idx],
        "local_rot": world.local_rot[idx],
        "local_scale": world.local_scale[idx],
        "partition_of": world.partition_of[idx],
    }
    modules = {}
    for name, m in world.modules.items():
        comps = _dump_module_components(m)
        if subset is not None:
            comps = [c for c in comps if c["entity"] in subset]
        modules[name] = {"version": getattr(m, "VERSION", 0), "components": comps}
    manifest = {
        "version": WORLD_VERSION,
        "capacity": world.capacity,
        "names": {str(e): n for e, n in world.names.items() if int(e) in set(ids)},
        "partitions": world.partitions,
        "modules": modules,
        "extra": {
            name: m.serialize() for name, m in world.modules.items()
            if type(m).serialize is not _base_serialize
        },
    }
    payload = _pack_payload(manifest, arrays)
    codec, compressed = _compress(payload)
    header = MAGIC + pystruct.pack("<I", WORLD_VERSION) + codec + pystruct.pack(
        "<II", len(payload), len(compressed)
    )
    return header + compressed


from lumixengine_tpu.engine.plugin import IModule as _IModule  # noqa: E402

_base_serialize = _IModule.serialize


def _parse(blob: bytes):
    if blob[:6] != MAGIC:
        raise ValueError("not a lumixengine_tpu world blob")
    version = pystruct.unpack_from("<I", blob, 6)[0]
    if version > WORLD_VERSION:
        raise ValueError(f"world version {version} is newer than supported {WORLD_VERSION}")
    codec = blob[10:14]
    raw_size, comp_size = pystruct.unpack_from("<II", blob, 14)
    payload = _decompress(codec, blob[22 : 22 + comp_size], raw_size)
    manifest, arrays = _unpack_payload(payload)
    if manifest["version"] > WORLD_VERSION:
        raise ValueError(f"world version {manifest['version']} is newer than supported {WORLD_VERSION}")
    # versioned migration hooks slot in here (≙ world.cpp legacy headers)
    return manifest, arrays


def deserialize_into(world, blob: bytes, emap: Optional[EntityMap] = None,
                     keep_ids: bool = False) -> List[int]:
    """Instantiate a serialized fragment into `world`. Returns new entity ids.
    keep_ids=True restores original ids (full world load into empty world)."""
    manifest, arrays = _parse(blob)
    emap = emap or EntityMap()
    ids = arrays["ids"]
    # pass 1: create entities
    created = []
    for i, old in enumerate(ids):
        old = int(old)
        if keep_ids:
            if world.alive[old]:
                raise ValueError(f"entity id {old} already in use")
            # force allocation of the exact slot
            world._free.remove(old)
            world.alive[old] = True
            world._count += 1
            new = old
        else:
            new = world.create_entity()
        world.local_pos[new] = arrays["local_pos"][i]
        world.local_rot[new] = arrays["local_rot"][i]
        world.local_scale[new] = arrays["local_scale"][i]
        world.partition_of[new] = arrays["partition_of"][i]
        emap.set(old, new)
        created.append(new)
    # pass 2: hierarchy
    for i, old in enumerate(ids):
        p_old = int(arrays["parent"][i])
        if p_old >= 0:
            world.parent[emap.get(int(old))] = emap.get(p_old)
    world._levels_dirty = True
    # names
    for old_str, name in manifest["names"].items():
        new = emap.get(int(old_str))
        if new >= 0:
            world.names[new] = name
    # partitions (full load only)
    if keep_ids:
        world.partitions = list(manifest["partitions"])
    # pass 3: components, module order
    for mname, mblob in manifest["modules"].items():
        if mname not in world.modules:
            continue  # system absent — skip its components (≙ reference skips)
        for comp in mblob["components"]:
            _restore_component(world, comp, emap)
    for mname, extra in manifest.get("extra", {}).items():
        if mname in world.modules:
            world.modules[mname].deserialize(extra, emap)
    return created


def load_world(engine, blob: bytes, capacity: Optional[int] = None):
    """Create a fresh world from a full serialized blob (≙ app runner's
    loadWorld → World::deserialize)."""
    manifest, _ = _parse(blob)
    world = engine.create_world(capacity=capacity or manifest["capacity"])
    deserialize_into(world, blob, keep_ids=True)
    return world


# -- prefabs (≙ engine/prefab.h PrefabResource + editor PrefabSystem) -------------


def make_prefab(world, root_entities: Sequence[int]) -> bytes:
    """Capture root entities + all their descendants as a prefab blob."""
    all_ids = set()
    frontier = list(int(e) for e in root_entities)
    while frontier:
        e = frontier.pop()
        if e in all_ids:
            continue
        all_ids.add(e)
        frontier.extend(world.children_of(e))
    return serialize_world(world, entities=sorted(all_ids))


def instantiate_prefab(world, prefab: bytes, position=None, rotation=None) -> List[int]:
    """≙ engine.cpp instantiatePrefab: deserialize with remap, then move the
    spawned roots to the given pose."""
    created = deserialize_into(world, prefab)
    if position is not None or rotation is not None:
        for e in created:
            if world.get_parent(e) == -1:
                world.set_local_transform(e, position=position, rotation=rotation)
    return created


# -- device-state checkpoints (≙ SURVEY.md §5: "world state is a pytree of
# arrays — checkpoint via orbax-style save of the SoA state + schema version")


def save_checkpoint(state, path: str) -> None:
    """Save a WorldState (or any engine pytree, incl. a vmapped world batch)
    to disk: npz leaves + the treedef — exact sim-state resume."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    manifest = {"version": WORLD_VERSION, "treedef": str(treedef),
                "n_leaves": len(leaves)}
    payload = _pack_payload(manifest, arrays)
    codec, compressed = _compress(payload)
    header = b"LXTPUC" + pystruct.pack("<I", WORLD_VERSION) + codec + pystruct.pack(
        "<II", len(payload), len(compressed))
    with open(path, "wb") as f:
        f.write(header + compressed)


def load_checkpoint(path: str, like) -> "object":
    """Restore a checkpoint into the structure of `like` (a template pytree
    from World.device_state() — the treedef carrier; shapes must match)."""
    import jax
    import jax.numpy as jnp

    with open(path, "rb") as f:
        blob = f.read()
    if blob[:6] != b"LXTPUC":
        raise ValueError("not a lumixengine_tpu checkpoint")
    codec = blob[10:14]
    raw_size, comp_size = pystruct.unpack_from("<II", blob, 14)
    payload = _decompress(codec, blob[22 : 22 + comp_size], raw_size)
    manifest, arrays = _unpack_payload(payload)
    leaves_t, treedef = jax.tree_util.tree_flatten(like)
    if manifest["n_leaves"] != len(leaves_t):
        raise ValueError("checkpoint structure mismatch")
    leaves = []
    for i, tmpl in enumerate(leaves_t):
        arr = arrays[f"leaf_{i}"]
        if hasattr(tmpl, "shape") and tuple(tmpl.shape) != tuple(arr.shape):
            raise ValueError(f"leaf {i} shape mismatch: {arr.shape} vs {tmpl.shape}")
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)
