"""Test configuration: force the CPU backend with 8 virtual devices.

Mirrors the reference's "multithreaded tests without a cluster" approach
(SURVEY.md §4): multi-chip sharding is validated on a virtual CPU mesh via
XLA_FLAGS=--xla_force_host_platform_device_count=8.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

os.environ.setdefault("CTT_JAX_CACHE", "/tmp/ctt_jax_cache_cpu")

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: crypto kernels are deep graphs; caching
# across test runs cuts pytest wall-clock dramatically.
cache_dir = os.environ["CTT_JAX_CACHE"]
try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
except Exception:
    pass
