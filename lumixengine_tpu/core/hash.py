"""Stable hashing (≙ reference core/hash.{h,cpp}: xxhash-based RuntimeHash,
64-bit StableHash, BoneNameHash, FilePathHash).

Self-contained FNV-1a/xx-style mixes — stable across runs and platforms (the
property the reference needs them for: content-addressed asset caches and
serialized name hashes).
"""
from __future__ import annotations

_FNV64_OFFSET = 0xCBF29CE484222325
_FNV64_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1
_MASK32 = (1 << 32) - 1


def stable_hash64(data) -> int:
    """64-bit stable content hash (≙ StableHash)."""
    if isinstance(data, str):
        data = data.encode()
    h = _FNV64_OFFSET
    for b in data:
        h ^= b
        h = (h * _FNV64_PRIME) & _MASK64
    # final avalanche (xx-style)
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _MASK64
    h ^= h >> 33
    return h


def stable_hash32(data) -> int:
    """32-bit runtime hash (≙ RuntimeHash)."""
    return stable_hash64(data) & _MASK32


def bone_name_hash(name: str) -> int:
    """≙ BoneNameHash — hashes the lower-cased bone name like the reference."""
    return stable_hash32(name.lower())


def file_path_hash(path: str) -> int:
    """≙ FilePathHash — hashes the normalized path."""
    norm = path.replace("\\", "/").lower()
    return stable_hash64(norm)
