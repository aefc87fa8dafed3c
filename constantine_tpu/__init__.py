"""constantine_tpu — a TPU-native pairing & polynomial-commitment framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
mratsim/constantine (constant-time EC/pairing/commitment cryptography for
Ethereum: EIP-4844 KZG, BLS signatures, EVM precompiles, hash-to-curve),
built batch-first for SPMD hardware. See SURVEY.md for the component map.

Layout (mirrors the reference's layer structure, SURVEY.md §1):
  ops/       compute kernels: limbs, fields, towers, EC, MSM, NTT, pairing
  named/     curve registry + build-time constant derivation
  models/    protocol layers: KZG, EIP-4844, BLS signatures, hash-to-curve
  parallel/  multi-chip sharding: mesh, input-split MSM, four-step NTT
  utils/     serialization codecs, hashes, host reference math
"""

import os as _os

# Persistent compilation cache: the field/EC/pairing graphs are deep; caching
# across processes cuts test and bench startup dramatically.
# Opt-in via CTT_JAX_CACHE only: a shared default path can mix AOT artifacts
# produced by different compile services (local CPU vs axon remote compile)
# whose machine feature sets differ.
if _os.environ.get("CTT_JAX_CACHE"):
    try:
        import jax as _jax
        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["CTT_JAX_CACHE"])
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass

__version__ = "0.1.0"
