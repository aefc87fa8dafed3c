"""Test configuration: force the CPU backend with 8 virtual devices.

Mirrors the reference's "multithreaded tests without a cluster" approach
(SURVEY.md §4): multi-chip sharding is validated on a virtual CPU mesh via
XLA_FLAGS=--xla_force_host_platform_device_count=8.

NB: the persistent compilation cache is deliberately NOT enabled here —
this jaxlib's zstandard-backed cache aborts the process on reads of
entries that were truncated (timeout-killed writer) or written by a
different compile service (axon remote vs local CPU: mismatched machine
features). In-process jit caching covers the repeated-shape case; set
CTT_JAX_CACHE explicitly to opt in for ad-hoc runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
