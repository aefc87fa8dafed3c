"""Extension tower tests vs host reference math (python ints).

Mirrors tests/math_extension_fields/ in the reference (field axioms,
mul/square/inv consistency, Fp12 tower sanity).
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.towers import build_tower
from constantine_tpu.utils import refmath as rm


def rand_elems(F, n, rng, p):
    coeffs = [[rng.randrange(p) for _ in range(F.deg)] for _ in range(n)]
    arr = jnp.asarray(np.stack([F.encode(c) for c in coeffs]))
    return coeffs, arr


@pytest.mark.parametrize("curve", ["BLS12_381", "BN254_Snarks"])
def test_fp2_vs_ref(curve):
    ctx = get_curve(curve)
    fp2, _, _ = build_tower(curve)
    p = ctx.p
    nr = ctx.params.fp2_nonresidue
    rng = random.Random(2)
    ca, aa = rand_elems(fp2, 16, rng, p)
    cb, ab = rand_elems(fp2, 16, rng, p)

    got = fp2.decode(fp2.mul(aa, ab))
    exp = [list(rm.fp2_mul(tuple(x), tuple(y), nr, p)) for x, y in zip(ca, cb)]
    assert got == exp

    got = fp2.decode(fp2.square(aa))
    exp = [list(rm.fp2_mul(tuple(x), tuple(x), nr, p)) for x in ca]
    assert got == exp

    got = fp2.decode(fp2.inv(aa))
    exp = [list(rm.fp2_inv(tuple(x), nr, p)) for x in ca]
    assert got == exp

    # batch_inv consistency
    got = fp2.decode(fp2.batch_inv(aa))
    assert got == exp


@pytest.mark.parametrize("curve", ["BLS12_381", "BN254_Snarks"])
def test_fp6_fp12_axioms(curve):
    """Field axioms + inv roundtrip on Fp6/Fp12 (no independent host impl:
    x * x^-1 == 1, distributivity, associativity on random elements)."""
    ctx = get_curve(curve)
    _, fp6, fp12 = build_tower(curve)
    p = ctx.p
    rng = random.Random(4)
    for F in (fp6, fp12):
        _, a = rand_elems(F, 4, rng, p)
        _, b = rand_elems(F, 4, rng, p)
        _, c = rand_elems(F, 4, rng, p)
        one = F.broadcast_one((4,))
        # inv roundtrip
        assert np.asarray(F.eq(F.mul(a, F.inv(a)), one)).all()
        # commutativity / associativity
        assert (np.asarray(F.mul(a, b)) == np.asarray(F.mul(b, a))).all()
        assert (np.asarray(F.mul(F.mul(a, b), c))
                == np.asarray(F.mul(a, F.mul(b, c)))).all()
        # distributivity
        lhs = F.mul(a, F.add(b, c))
        rhs = F.add(F.mul(a, b), F.mul(a, c))
        assert (np.asarray(lhs) == np.asarray(rhs)).all()
        # square == mul self
        assert (np.asarray(F.square(a)) == np.asarray(F.mul(a, a))).all()


def test_fp12_multiplicative_order():
    """x^(p^12 - 1) == 1 sanity on a random Fp12 element (Fermat in the
    extension): checked via x^(p^6-1)·conj structure is overkill; instead
    verify x^(p-1 style) small exponent identities hold: (x^a)^b == x^(ab)."""
    ctx = get_curve("BLS12_381")
    _, _, fp12 = build_tower("BLS12_381")
    rng = random.Random(9)
    _, a = rand_elems(fp12, 2, rng, ctx.p)
    e1, e2 = 12345, 67891
    lhs = fp12.pow_const(fp12.pow_const(a, e1), e2)
    rhs = fp12.pow_const(a, e1 * e2)
    assert (np.asarray(lhs) == np.asarray(rhs)).all()
