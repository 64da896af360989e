"""Native (C++) runtime components — built on demand with g++, bound via ctypes.

The reference keeps its hot host-side paths native (LZ4 world compression,
allocators, job system). On the TPU build the device side is XLA; the
host-side native piece that still pays for itself is the serialization codec:
csrc/lz4_codec.cpp implements the LZ4 block format used for world/prefab
blobs (≙ external/lz4 + engine/world.cpp compressed serialization).

Build-on-import with graceful fallback: if g++ or the build fails, callers
(engine/serialize.py) fall back to zlib transparently.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_lock = threading.Lock()
_lib = None
_tried = False

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRCS = [os.path.join(_ROOT, "csrc", "lz4_codec.cpp"),
         os.path.join(_ROOT, "csrc", "nav_astar.cpp"),
         os.path.join(_ROOT, "csrc", "soft_raster.cpp")]
_OUT_DIR = os.path.join(_ROOT, ".native_cache")
_OUT = os.path.join(_OUT_DIR, "liblxt_native.so")


def _build() -> bool:
    try:
        os.makedirs(_OUT_DIR, exist_ok=True)
        srcs = [s for s in _SRCS if os.path.exists(s)]
        newest = max(os.path.getmtime(s) for s in srcs)
        if os.path.exists(_OUT) and os.path.getmtime(_OUT) >= newest:
            return True
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *srcs, "-o", _OUT]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_OUT)
            lib.lxt_lz4_bound.restype = ctypes.c_int
            lib.lxt_lz4_bound.argtypes = [ctypes.c_int]
            lib.lxt_lz4_compress.restype = ctypes.c_int
            lib.lxt_lz4_compress.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int
            ]
            lib.lxt_lz4_decompress.restype = ctypes.c_int
            lib.lxt_lz4_decompress.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int
            ]
            lib.lxt_nav_astar.restype = ctypes.c_int
            lib.lxt_nav_astar.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ]
            fp = ctypes.POINTER(ctypes.c_float)
            lib.lxt_raster_tris.restype = ctypes.c_int
            lib.lxt_raster_tris.argtypes = [
                fp, fp, ctypes.c_int, ctypes.c_int,
                fp, fp, fp, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def lz4_compress(data: bytes) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    bound = lib.lxt_lz4_bound(len(data))
    out = ctypes.create_string_buffer(bound)
    n = lib.lxt_lz4_compress(data, len(data), out, bound)
    if n < 0:
        raise RuntimeError("lz4 compress failed")
    return out.raw[:n]


def lz4_decompress(data: bytes, raw_size: int) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    out = ctypes.create_string_buffer(raw_size)
    n = lib.lxt_lz4_decompress(data, len(data), out, raw_size)
    if n != raw_size:
        raise RuntimeError(f"lz4 decompress failed ({n} != {raw_size})")
    return out.raw


def raster_tris(fb, zb, tv, tz, cols) -> int:
    """Native z-buffered triangle fill (csrc/soft_raster.cpp — exact mirror
    of renderer/raster.py's numpy loop). fb [H,W,3] f32 and zb [H,W] f32 are
    mutated in place; tv [T,3,2] screen xy, tz [T,3] view depth,
    cols [T,3] rgb. Returns pixels written."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable")
    assert fb.dtype == np.float32 and fb.flags.c_contiguous
    assert zb.dtype == np.float32 and zb.flags.c_contiguous
    tvc = np.ascontiguousarray(tv, np.float32)
    tzc = np.ascontiguousarray(tz, np.float32)
    cc = np.ascontiguousarray(cols, np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    return lib.lxt_raster_tris(
        fb.ctypes.data_as(fp), zb.ctypes.data_as(fp),
        fb.shape[1], fb.shape[0],
        tvc.ctypes.data_as(fp), tzc.ctypes.data_as(fp),
        cc.ctypes.data_as(fp), len(tzc))


def nav_astar(walkable, sx: int, sz: int, gx: int, gz: int, max_cells: int = 65536):
    """Native grid A* (≙ Detour findPath). walkable: bool [H, W].
    Returns int32 [L, 2] (x, z) cells start→goal, or None."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native pathfinder unavailable")
    w8 = np.ascontiguousarray(walkable, dtype=np.uint8)
    h, w = w8.shape
    out = (ctypes.c_int32 * (2 * max_cells))()
    n = lib.lxt_nav_astar(w8.tobytes(), w, h, int(sx), int(sz), int(gx), int(gz),
                          out, max_cells)
    if n < 0:
        return None
    return np.ctypeslib.as_array(out)[: 2 * n].reshape(n, 2).copy()
