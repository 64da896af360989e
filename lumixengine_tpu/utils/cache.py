"""Persistent XLA compilation cache — step programs compile in minutes on a
cold cache; caching makes bench/driver re-runs with unchanged shapes instant."""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    if path is None:
        # ONE CACHE DIR PER BACKEND: the tunneled TPU backend remote-compiles
        # on a machine with different host CPU features; loading its CPU AOT
        # artifacts locally SIGILLs/segfaults (cpu_aot_loader warns about
        # +prefer-no-scatter feature mismatch before dying)
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "any"
        suffix = "" if backend not in ("cpu",) else "-cpu"
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".jax_cache" + suffix)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:
            pass
    except Exception:
        # cache is best-effort; never fail the caller
        pass
