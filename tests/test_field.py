"""Field arithmetic tests.

Mirrors the reference's test strategy (SURVEY.md §4):
* tiny-field exhaustive tests (tests/math_fields/t_finite_fields.nim:21-60
  uses mod-101 checks against plain uint arithmetic),
* random differential tests against an independent implementation — the
  reference uses GMP (t_finite_fields_vs_gmp.nim); we use python ints.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_field, get_curve
from constantine_tpu.ops import limbs as lb


TEST_MODULI = ["F101", "F65519", "Mersenne61", "BabyBear", "Goldilocks",
               "Mersenne127"]
CURVE_FIELDS = ["BLS12_381.Fp", "BLS12_381.Fr", "BN254_Snarks.Fp",
                "Pallas.Fp", "Secp256k1.Fp"]


@pytest.mark.parametrize("name", TEST_MODULI + CURVE_FIELDS)
def test_field_ops_random_vs_pyint(name):
    F = get_field(name)
    p = F.p_int
    rng = random.Random(hash(name) & 0xFFFF)
    n = 32
    xs = [rng.randrange(p) for _ in range(n)]
    ys = [rng.randrange(p) for _ in range(n)]
    ax, ay = jnp.asarray(F.encode(xs)), jnp.asarray(F.encode(ys))

    assert F.decode(F.mul(ax, ay)) == [x * y % p for x, y in zip(xs, ys)]
    assert F.decode(F.add(ax, ay)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert F.decode(F.sub(ax, ay)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert F.decode(F.neg(ax)) == [(-x) % p for x in xs]
    assert F.decode(F.square(ax)) == [x * x % p for x in xs]
    assert F.decode(F.div2(ax)) == [x * pow(2, -1, p) % p for x in xs]


def test_field_exhaustive_f101():
    """Exhaustive add/sub/mul over all of GF(101) (reference
    t_finite_fields.nim mod-101 suite, but complete)."""
    F = get_field("F101")
    p = 101
    vals = list(range(p))
    a = jnp.asarray(F.encode(vals))
    ax = jnp.repeat(a, p, axis=0)          # all pairs (x, y)
    ay = jnp.tile(a, (p, 1))
    xs = [x for x in vals for _ in vals]
    ys = vals * p
    assert F.decode(F.mul(ax, ay)) == [x * y % p for x, y in zip(xs, ys)]
    assert F.decode(F.add(ax, ay)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert F.decode(F.sub(ax, ay)) == [(x - y) % p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("name", ["F101", "BLS12_381.Fp", "BLS12_381.Fr"])
def test_inversion(name):
    F = get_field(name)
    p = F.p_int
    rng = random.Random(7)
    xs = [rng.randrange(1, p) for _ in range(17)]
    ax = jnp.asarray(F.encode(xs))
    assert F.decode(F.inv(ax)) == [pow(x, -1, p) for x in xs]
    # batch_inv with zeros interleaved
    az = ax.at[5].set(0)
    exp = [pow(x, -1, p) if i != 5 else 0 for i, x in enumerate(xs)]
    assert F.decode(F.batch_inv(az)) == exp


def test_pow_const():
    F = get_field("BLS12_381.Fr")
    p = F.p_int
    rng = random.Random(3)
    xs = [rng.randrange(p) for _ in range(8)]
    ax = jnp.asarray(F.encode(xs))
    for e in (0, 1, 2, 3, 65537, (p - 1) // 2, p - 2):
        assert F.decode(F.pow_const(ax, e)) == [pow(x, e, p) for x in xs]


def test_montgomery_domain_roundtrip():
    F = get_field("BLS12_381.Fp")
    rng = random.Random(11)
    xs = [rng.randrange(F.p_int) for _ in range(16)]
    a = jnp.asarray(F.from_int(xs))
    back = F.to_int(np.asarray(F.from_mont(F.to_mont(a))))
    assert back == xs


def test_limb_bytes_roundtrip():
    rng = random.Random(5)
    data = bytes(rng.getrandbits(8) for _ in range(32 * 10))
    limbs = lb.bytes_be_to_limbs(data, 32, 16)
    assert lb.limbs_to_bytes_be(limbs, 32) == data
    # matches python int parsing
    for i in range(10):
        chunk = data[32 * i:32 * (i + 1)]
        assert lb.limbs_to_int(limbs[i]) == int.from_bytes(chunk, "big")


def test_unrolled_matches_scan_path():
    from constantine_tpu.ops.field import Field
    F = get_field("BLS12_381.Fp")
    FU = Field(F.p_int, unroll=True)
    rng = random.Random(13)
    xs = [rng.randrange(F.p_int) for _ in range(8)]
    ys = [rng.randrange(F.p_int) for _ in range(8)]
    ax, ay = jnp.asarray(F.encode(xs)), jnp.asarray(F.encode(ys))
    a = np.asarray(F.mul(ax, ay))
    b = np.asarray(FU.mul(ax, ay))
    assert (a == b).all()
    assert (np.asarray(F.add(ax, ay)) == np.asarray(FU.add(ax, ay))).all()
