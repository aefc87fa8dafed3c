"""NTT tests vs naive host DFT (mirrors tests/math_polynomials/t_fft.nim:
roundtrip, matches naive evaluation, linearity)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.ntt import get_domain, bit_reversal_perm


def naive_dft(coeffs, omega, p):
    n = len(coeffs)
    return [sum(coeffs[j] * pow(omega, j * k, p) for j in range(n)) % p
            for k in range(n)]


@pytest.mark.parametrize("log_n", [0, 1, 3, 6])
def test_ntt_vs_naive(log_n):
    ctx = get_curve("BLS12_381")
    dom = get_domain("BLS12_381", log_n)
    p = ctx.r
    n = 1 << log_n
    rng = random.Random(log_n)
    coeffs = [rng.randrange(p) for _ in range(n)]
    x = jnp.asarray(ctx.fr.encode(coeffs))
    got = ctx.fr.decode(dom.ntt(x))
    if not isinstance(got, list):
        got = [got]
    assert got == naive_dft(coeffs, dom.omega, p)


@pytest.mark.parametrize("log_n", [4, 8])
def test_intt_roundtrip(log_n):
    ctx = get_curve("BLS12_381")
    dom = get_domain("BLS12_381", log_n)
    rng = random.Random(77)
    coeffs = [rng.randrange(ctx.r) for _ in range(1 << log_n)]
    x = jnp.asarray(ctx.fr.encode(coeffs))
    back = ctx.fr.decode(dom.intt(dom.ntt(x)))
    assert back == coeffs
    # batched (leading axis)
    xb = jnp.stack([x, x], axis=0)
    rb = dom.intt(dom.ntt(xb))
    assert (np.asarray(rb)[0] == np.asarray(x)).all()


def test_brp():
    assert list(bit_reversal_perm(8)) == [0, 4, 2, 6, 1, 5, 3, 7]
    ctx = get_curve("BLS12_381")
    dom = get_domain("BLS12_381", 3)
    x = jnp.asarray(ctx.fr.encode(list(range(8))))
    perm = ctx.fr.decode(dom.brp_permute(x))
    assert perm == [0, 4, 2, 6, 1, 5, 3, 7]


def test_ntt_linearity():
    ctx = get_curve("BLS12_381")
    dom = get_domain("BLS12_381", 5)
    rng = random.Random(3)
    a = [rng.randrange(ctx.r) for _ in range(32)]
    b = [rng.randrange(ctx.r) for _ in range(32)]
    xa = jnp.asarray(ctx.fr.encode(a))
    xb = jnp.asarray(ctx.fr.encode(b))
    lhs = dom.ntt(ctx.fr.add(xa, xb))
    rhs = ctx.fr.add(dom.ntt(xa), dom.ntt(xb))
    assert (np.asarray(lhs) == np.asarray(rhs)).all()
