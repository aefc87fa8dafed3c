"""Differential tests for the arbitrary-precision stack (ops/bigint_ap.py)
vs CPython ints — the GMP-differential strategy of the reference
(tests/math_arbitrary_precision/t_bigints_powmod_vs_gmp.nim), with the
operand-size sweeps and even-moduli (mod-2^k split) cases VERDICT r3 #8
called for."""

import random

import numpy as np
import pytest

from constantine_tpu.ops import bigint_ap as ap


def _roundtrip(v: int, nb: int) -> np.ndarray:
    return ap.from_bytes(v.to_bytes(nb, "big"))


def test_divmod_sweep():
    rng = random.Random(1)
    for _ in range(300):
        nb = rng.randrange(1, 48)
        db = rng.randrange(1, 48)
        u = rng.randrange(1 << (8 * nb))
        v = rng.randrange(1, 1 << (8 * db))
        q, r = ap.divmod_ap(_roundtrip(u, nb), _roundtrip(v, db))
        assert (int.from_bytes(ap.to_bytes(q, 64), "big"),
                int.from_bytes(ap.to_bytes(r, 64), "big")) == divmod(u, v)


def test_divmod_edges():
    cases = [(0, 1), (1, 1), (2**256 - 1, 2**128), (2**256, 2**256 - 1),
             (2**300, 3), (12345, 12345), (12344, 12345),
             (2**160 - 1, 2**16 - 1), (2**160 - 1, 2**16),
             ((2**64 - 1) * (2**64 - 2), 2**64 - 1)]
    for u, v in cases:
        q, r = ap.divmod_ap(_roundtrip(u, 64), _roundtrip(v, 64))
        assert (int.from_bytes(ap.to_bytes(q, 64), "big"),
                int.from_bytes(ap.to_bytes(r, 64), "big")) == divmod(u, v)


def test_powmod_sweep():
    rng = random.Random(2)
    for _ in range(80):
        b = rng.randrange(0, 1 << rng.randrange(1, 280))
        e = rng.choice([0, 1, 2, rng.randrange(1 << rng.randrange(1, 160))])
        m = rng.randrange(1, 1 << rng.randrange(1, 220))
        got = ap.powmod(_roundtrip(b, 64), _roundtrip(e, 32),
                        _roundtrip(m, 64))
        assert int.from_bytes(ap.to_bytes(got, 80), "big") == pow(b, e, m)


def test_powmod_even_moduli():
    """The mod-2^k split (limbs_mod2k.nim analogue): pure powers of two,
    mixed q*2^k, and large 2-adic valuations."""
    cases = [(123456789, 77, 2**64), (3, 10**6, 2**37 * 99991),
             (2**200 + 5, 2**100 + 3, 2**128 * (2**61 - 1)),
             (10, 10, 1024), (2**255, 2**255, 2**255),
             (7, 5, 2 * (2**127 - 1)), (6, 1 << 70, 4 * 3**50)]
    for b, e, m in cases:
        got = ap.powmod(_roundtrip(b, 64), _roundtrip(e, 64),
                        _roundtrip(m, 64))
        assert int.from_bytes(ap.to_bytes(got, 96), "big") == pow(b, e, m)


def test_powmod_trivial():
    for b, e, m in [(5, 0, 7), (0, 5, 9), (0, 0, 13), (7, 1, 1),
                    (1, 10**9, 2), (4, 3, 2)]:
        got = ap.powmod(_roundtrip(b, 16), _roundtrip(e, 16),
                        _roundtrip(m, 16))
        assert int.from_bytes(ap.to_bytes(got, 32), "big") == pow(b, e, m)


def test_evm_modexp_uses_own_stack():
    from constantine_tpu.models.evm_precompiles import eth_evm_modexp
    b, e, m = 0x1234567890ABCDEF, 0x10001, 2**89 * 101
    data = ((8).to_bytes(32, "big") + (4).to_bytes(32, "big")
            + (16).to_bytes(32, "big")
            + b.to_bytes(8, "big") + e.to_bytes(4, "big")
            + m.to_bytes(16, "big"))
    out = eth_evm_modexp(data)
    assert int.from_bytes(out, "big") == pow(b, e, m)
