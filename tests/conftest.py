"""Test env: force CPU backend with 8 virtual devices so multi-chip sharding
tests run without a TPU pod (SURVEY.md §4). Must run before jax import."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
