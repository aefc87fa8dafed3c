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
    flags += " --xla_force_host_platform_device_count=8"
if "parallel_codegen" not in flags:
    # The XLA CPU backend's parallel LLVM codegen (default split count 32)
    # segfaults sporadically on very large modules (pairing programs) on
    # this 2-CPU box; serialize codegen — compile time cost is minor
    # relative to the lost 30-minute suite runs.
    flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags

# The XLA CPU compiler segfaults sporadically on very deep programs (large
# multi-pairing jits) — consistent with LLVM blowing an 8 MB default thread
# stack. Raise the stack rlimit BEFORE jax creates its compile threads
# (pthread stacks inherit the rlimit at thread creation).
import resource

try:
    soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
    want = 512 * 1024 * 1024
    if soft != resource.RLIM_INFINITY and soft < want:
        new_soft = want if hard == resource.RLIM_INFINITY else min(want, hard)
        resource.setrlimit(resource.RLIMIT_STACK, (new_soft, hard))
except (ValueError, OSError):
    pass

import jax

jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    """Schedule the heaviest-compile files last: the XLA CPU compiler's
    sporadic segfault (large multi-pairing programs) kills an xdist
    worker's remaining queue, so keep nothing queued behind the risk."""
    risky = ("test_bls_spec_vectors",)
    items.sort(key=lambda it: any(r in it.nodeid for r in risky))
