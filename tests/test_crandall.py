"""Crandall / pseudo-Mersenne field path vs python-int reference.

Mirrors the reference's Crandall coverage (limbs_crandall.nim, selected in
named/properties_fields.nim:104-112): mul/add/inv over secp256k1 Fp,
2^255-19, Mersenne61/127, Goldilocks, plus the registry wiring (secp256k1
curve context must pick the Crandall field and still satisfy EC identities).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.ops.crandall import CrandallField, crandall_c
from constantine_tpu.ops.field import Field
from constantine_tpu.named.precompute import get_curve, get_field

PRIMES = {
    "secp256k1": 2**256 - 2**32 - 977,
    "ed25519": (1 << 255) - 19,
    "Mersenne61": (1 << 61) - 1,
    "Mersenne127": (1 << 127) - 1,
    "Goldilocks": (1 << 64) - (1 << 32) + 1,
}


def test_crandall_shape_detection():
    for p in PRIMES.values():
        assert crandall_c(p) is not None
    # not pseudo-Mersenne / c too large
    assert crandall_c(0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001) is None
    assert crandall_c(101) is None          # tiny m
    assert crandall_c((1 << 31) - (1 << 27) + 1) is None  # BabyBear: c >= 2^(m/2)


@pytest.mark.parametrize("name", sorted(PRIMES))
def test_crandall_arith_vs_python(name):
    p = PRIMES[name]
    F = CrandallField(p, name)
    rng = np.random.default_rng(hash(name) % 2**32)
    xs = [int.from_bytes(rng.bytes(40), "big") % p for _ in range(6)] + [0, 1, p - 1]
    ys = [int.from_bytes(rng.bytes(40), "big") % p for _ in range(6)] + [p - 1, p - 1, p - 1]
    a = jnp.asarray(F.encode(xs))
    b = jnp.asarray(F.encode(ys))
    assert F.decode(F.mul(a, b)) == [(x * y) % p for x, y in zip(xs, ys)]
    assert F.decode(F.square(a)) == [(x * x) % p for x in xs]
    assert F.decode(F.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert F.decode(F.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert F.decode(F.inv(a)) == [pow(x, -1, p) if x else 0 for x in xs]
    assert F.decode(F.batch_inv(a)) == [pow(x, -1, p) if x else 0 for x in xs]
    # canonical representation: Montgomery maps are identity
    assert F.decode(F.to_mont(a)) == xs


def test_secp256k1_uses_crandall_and_ec_works():
    ctx = get_curve("Secp256k1")
    assert isinstance(ctx.fp, CrandallField)
    assert not isinstance(ctx.fr, CrandallField)   # r is not 2^m - small
    G = ctx.g1.from_affine(ctx.g1_gen)
    r = jnp.asarray(ctx.scalars_to_limbs([ctx.r]))
    assert np.asarray(ctx.g1.is_inf(ctx.g1.scalar_mul(r, G, scalar_bits=256)))[0]


def test_registry_test_fields_pick_crandall():
    assert isinstance(get_field("Mersenne61"), CrandallField)
    assert isinstance(get_field("Goldilocks"), CrandallField)
    assert type(get_field("F101")) is Field
    assert type(get_field("BabyBear")) is Field
