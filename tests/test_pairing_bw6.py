"""BW6-761 pairing tests: tower Frobenius, bilinearity, GT order,
pairing check (reference: pairings_bw6_761.nim + t_pairing_bw6_761_optate).

Both G1 and G2 live over Fp, so the host integer reference (refmath.ec_mul
with a=0 on y^2 = x^3 - 1 and y^2 = x^3 + 4) drives all point generation.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.ops.pairing_bw6 import get_bw6_pairing
from constantine_tpu.utils import refmath as rm


@pytest.fixture(scope="module")
def pr():
    return get_bw6_pairing()


def g1_points(pr, ks):
    ctx = pr.ctx
    pts = [rm.ec_mul(k, ctx.g, 0, ctx.p) for k in ks]
    return (jnp.asarray(ctx.fp.encode([p[0] for p in pts])),
            jnp.asarray(ctx.fp.encode([p[1] for p in pts])))


def g2_points(pr, ks):
    ctx = pr.ctx
    pts = [rm.ec_mul(k, pr.g2_gen_int, 0, ctx.p) for k in ks]
    return (jnp.asarray(ctx.fp.encode([p[0] for p in pts])),
            jnp.asarray(ctx.fp.encode([p[1] for p in pts])))


def test_generators(pr):
    ctx = pr.ctx
    p, r = ctx.p, ctx.r
    assert rm.ec_is_on_curve(ctx.g, 0, p - 1, p)
    assert rm.ec_is_on_curve(pr.g2_gen_int, 0, 4, p)
    assert rm.ec_mul(r, pr.g2_gen_int, 0, p) is None


def test_frobenius(pr):
    """frobenius(x) == x^p on a random Fp6 element."""
    f6 = pr.fp6
    rng = random.Random(3)
    x = f6.encode([rng.randrange(pr.ctx.p) for _ in range(6)])[None]
    got = np.asarray(pr.frobenius(jnp.asarray(x), 1))
    want = np.asarray(f6.pow_const(jnp.asarray(x), pr.ctx.p))
    assert (got == want).all()
    got3 = np.asarray(pr.frobenius(jnp.asarray(x), 3))
    want3 = np.asarray(f6.pow_const(jnp.asarray(x), pr.ctx.p**3))
    assert (got3 == want3).all()


def test_bilinearity(pr):
    ctx = pr.ctx
    r = ctx.r
    rng = random.Random(7)
    a, b = rng.randrange(2, r), rng.randrange(2, r)
    P = g1_points(pr, [a, a * b % r, 1])
    Q = g2_points(pr, [b, 1, a * b % r])
    gt = np.asarray(pr.pairing(P, Q))
    assert (gt[0] == gt[1]).all(), "e([a]P,[b]Q) != e([ab]P, Q)"
    assert (gt[0] == gt[2]).all(), "e([a]P,[b]Q) != e(P, [ab]Q)"


def test_non_degenerate_gt_order(pr):
    ctx = pr.ctx
    P = g1_points(pr, [1])
    Q = g2_points(pr, [1])
    gt = pr.pairing(P, Q)
    one = pr.fp6.broadcast_one((1,))
    assert not np.asarray(pr.fp6.eq(gt, one))[0], "pairing degenerate"
    gtr = pr.fp6.pow_const(gt, ctx.r)
    assert np.asarray(pr.fp6.eq(gtr, one))[0], "GT element order != r"


def test_pairing_check(pr):
    ctx = pr.ctx
    rng = random.Random(11)
    k = rng.randrange(2, ctx.r)
    xP, yP = g1_points(pr, [k, k])
    yP = jnp.concatenate([yP[0:1], ctx.fp.neg(yP[1:2])], axis=0)
    Q = g2_points(pr, [5, 5])
    assert bool(np.asarray(pr.pairing_check((xP, yP), Q)))
    Q_bad = g2_points(pr, [5, 6])
    assert not bool(np.asarray(pr.pairing_check((xP, yP), Q_bad)))
