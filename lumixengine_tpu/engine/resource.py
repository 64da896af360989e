"""Resource system (≙ reference engine/resource.{h,cpp} + resource manager hub).

Reference: ref-counted async Resource with EMPTY→READY/FAILURE states, a
per-type ResourceManager, a hub owning them; loads go through the FileSystem's
IO thread and callbacks fire on the main thread; the editor's AssetCompiler
populates a compiled-blob cache keyed by content hash.

TPU build: same state machine and hub surface. IO runs on a thread pool
(engine/file_system.py); "compiling" an asset means baking it into device
arrays (models → ModelBank, clips → ClipBank, particle scripts → compiled
emitters), so the AssetCompiler analog is the bake step with a content-hash
cache.
"""
from __future__ import annotations

import threading
from typing import Any, Callable, Dict, List, Optional

from lumixengine_tpu.core.hash import stable_hash64

# resource states (≙ resource.h Resource::State)
EMPTY = 0
READY = 1
FAILURE = 2


class Resource:
    """Ref-counted async resource."""

    TYPE = "resource"

    def __init__(self, path: str, manager: "ResourceManager"):
        self.path = path
        self.manager = manager
        self.state = EMPTY
        self.refcount = 0
        self.data: Any = None
        self.error: Optional[str] = None
        self._callbacks: List[Callable[["Resource"], None]] = []
        self._lock = threading.Lock()

    @property
    def is_ready(self) -> bool:
        return self.state == READY

    @property
    def is_failure(self) -> bool:
        return self.state == FAILURE

    def on_loaded(self, cb: Callable[["Resource"], None]) -> None:
        with self._lock:
            if self.state != EMPTY:
                cb(self)
            else:
                self._callbacks.append(cb)

    def _finish(self, state: int, data: Any = None, error: Optional[str] = None) -> None:
        with self._lock:
            self.state = state
            self.data = data
            self.error = error
            cbs = self._callbacks
            self._callbacks = []
        for cb in cbs:
            cb(self)

    # override: parse raw bytes → resource data (≙ Resource::load(Span<u8>))
    def load_blob(self, blob: bytes) -> Any:
        return blob


class ResourceManager:
    """Per-type manager (≙ resource.h ResourceManager)."""

    def __init__(self, hub: "ResourceManagerHub", rtype: str, factory: Callable[..., Resource]):
        self.hub = hub
        self.rtype = rtype
        self.factory = factory
        self.resources: Dict[str, Resource] = {}

    def load(self, path: str) -> Resource:
        res = self.resources.get(path)
        if res is None:
            res = self.factory(path, self)
            self.resources[path] = res
            self.hub.fs.read_async(path, lambda blob, err: self._on_read(res, blob, err))
        res.refcount += 1
        return res

    def _on_read(self, res: Resource, blob: Optional[bytes], err: Optional[str]) -> None:
        if err is not None:
            res._finish(FAILURE, error=err)
            return
        try:
            data = res.load_blob(blob)
            res._finish(READY, data=data)
        except Exception as e:  # noqa: BLE001 — load failures become FAILURE state
            res._finish(FAILURE, error=str(e))

    def unload(self, res: Resource) -> None:
        res.refcount -= 1
        if res.refcount <= 0:
            self.resources.pop(res.path, None)
            res.state = EMPTY
            res.data = None


class ResourceManagerHub:
    """≙ resource.h ResourceManagerHub — owns one manager per type."""

    def __init__(self, fs):
        self.fs = fs
        self.managers: Dict[str, ResourceManager] = {}

    def register(self, rtype: str, factory: Callable[..., Resource] = Resource) -> ResourceManager:
        m = ResourceManager(self, rtype, factory)
        self.managers[rtype] = m
        return m

    def load(self, rtype: str, path: str) -> Resource:
        if rtype not in self.managers:
            self.register(rtype)
        return self.managers[rtype].load(path)


class AssetCache:
    """Content-hash keyed compiled-asset cache (≙ editor/asset_compiler.h:
    background compile of sources → .res blobs keyed by hash)."""

    def __init__(self):
        self._cache: Dict[int, Any] = {}
        self.hits = 0
        self.misses = 0

    def get_or_bake(self, source_bytes: bytes, bake: Callable[[], Any]) -> Any:
        key = stable_hash64(source_bytes)
        if key in self._cache:
            self.hits += 1
            return self._cache[key]
        self.misses += 1
        out = bake()
        self._cache[key] = out
        return out
