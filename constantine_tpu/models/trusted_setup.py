"""Ethereum KZG trusted setup loading (EIP-4844 / ckzg text format).

Re-design of the reference's SRS machinery
(constantine/commitments_setups/ethereum_kzg_srs.nim:154-466:
EthereumKZGContext holding srs_lagrange_brp_g1 / srs_monomial_g1 /
srs_monomial_g2, text-format parser at :242-411). The setup file shipped in
constantine_tpu/data/ is the standard public Ethereum ceremony output (same
artifact as the reference's trusted_setup_ethereum_kzg4844_reference.dat).

Decompression of the 8k+ setup points is batched on device; the decompressed
Montgomery-form tables are cached as .npz so restarts skip the expensive
sqrt/subgroup work (the checkpoint/resume item from SURVEY.md §5).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..named.precompute import get_curve
from ..ops.ntt import get_domain, bit_reversal_perm
from ..utils.serialization import get_codec

FIELD_ELEMENTS_PER_BLOB = 4096
LOG_BLOB = 12

_DATA = os.path.join(os.path.dirname(__file__), "..", "data")
DEFAULT_SETUP = os.path.join(_DATA, "trusted_setup_ethereum_kzg4844.dat")


class KZGSettings:
    def __init__(self, path: str = DEFAULT_SETUP, subgroup_check: bool = None,
                 cache: bool = True):
        self.ctx = get_curve("BLS12_381")
        self.domain = get_domain("BLS12_381", LOG_BLOB)
        if subgroup_check is None:
            subgroup_check = os.environ.get("CTT_SRS_SUBGROUP_CHECK", "0") == "1"

        cache_path = path + ".cache.npz"
        if cache and os.path.exists(cache_path) and \
                os.path.getmtime(cache_path) >= os.path.getmtime(path):
            z = np.load(cache_path)
            self.g1_lagrange_brp = (jnp.asarray(z["lx"]), jnp.asarray(z["ly"]))
            self.g1_monomial = (jnp.asarray(z["mx"]), jnp.asarray(z["my"]))
            self.g2_monomial = (jnp.asarray(z["g2x"]), jnp.asarray(z["g2y"]))
        else:
            self._load(path, subgroup_check)
            if cache:
                try:
                    np.savez(cache_path,
                             lx=np.asarray(self.g1_lagrange_brp[0]),
                             ly=np.asarray(self.g1_lagrange_brp[1]),
                             mx=np.asarray(self.g1_monomial[0]),
                             my=np.asarray(self.g1_monomial[1]),
                             g2x=np.asarray(self.g2_monomial[0]),
                             g2y=np.asarray(self.g2_monomial[1]))
                except OSError:
                    pass

    def _load(self, path: str, subgroup_check: bool):
        codec = get_codec()
        with open(path) as f:
            tokens = f.read().split()
        n_g1 = int(tokens[0])
        n_g2 = int(tokens[1])
        assert n_g1 == FIELD_ELEMENTS_PER_BLOB, "unexpected setup size"
        off = 2
        g1_lag_hex = tokens[off:off + n_g1]
        off += n_g1
        g2_hex = tokens[off:off + n_g2]
        off += n_g2
        g1_mono_hex = tokens[off:off + n_g1] if len(tokens) >= off + n_g1 else None

        lag_bytes = bytes.fromhex("".join(g1_lag_hex))
        (lx, ly), inf, ok = codec.g1_decompress(lag_bytes, subgroup_check)
        assert bool(np.asarray(ok).all()), "invalid G1 Lagrange setup point"
        # file stores natural order; protocol wants bit-reversed (brp) order
        # (ethereum_kzg_srs.nim:154-200 srs_lagrange_brp_g1)
        brp = bit_reversal_perm(n_g1)
        self.g1_lagrange_brp = (jnp.take(lx, jnp.asarray(brp), axis=0),
                                jnp.take(ly, jnp.asarray(brp), axis=0))

        if g1_mono_hex is not None:
            mono_bytes = bytes.fromhex("".join(g1_mono_hex))
            (mx, my), inf, ok = codec.g1_decompress(mono_bytes, subgroup_check)
            assert bool(np.asarray(ok).all()), "invalid G1 monomial setup point"
            self.g1_monomial = (mx, my)
        else:
            self.g1_monomial = None

        g2_bytes = bytes.fromhex("".join(g2_hex))
        (g2x, g2y), inf, ok = codec.g2_decompress(g2_bytes, subgroup_check)
        assert bool(np.asarray(ok).all()), "invalid G2 setup point"
        self.g2_monomial = (g2x, g2y)


@functools.lru_cache(maxsize=None)
def get_settings(path: str = DEFAULT_SETUP) -> KZGSettings:
    return KZGSettings(path)
