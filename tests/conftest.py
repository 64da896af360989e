"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
tests run without a TPU pod (SURVEY.md §4).

Note: this image's sitecustomize imports jax at interpreter startup, so
setting JAX_PLATFORMS here via os.environ is too late — jax's config default
was already read. Backends are not *initialised* until first use though, so
``jax.config.update`` still wins. Both paths are set for robustness.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by XLA
# retraces/compiles (VERDICT r1 weak #4); cache survives across test runs.
from lumixengine_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
