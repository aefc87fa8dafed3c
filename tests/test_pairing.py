"""Pairing tests: bilinearity, non-degeneracy, multi-pairing, GT order.

Mirrors the reference's pairing suite
(tests/math_pairings/t_pairing_bls12_381_optate.nim, t_pairing_template.nim:
bilinearity e([a]P, [b]Q) == e(P, Q)^(ab), identity handling)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.pairing import get_pairing
from constantine_tpu.utils import refmath as rm


@pytest.fixture(scope="module",
                params=["BLS12_381", "BLS12_377", "BN254_Nogami"])
def pr(request):
    return get_pairing(request.param)


def g1_points(ctx, ks):
    pts = [rm.ec_mul(k, ctx.g, ctx.params.a, ctx.p) for k in ks]
    x = jnp.asarray(ctx.fp.encode([pt[0] for pt in pts]))
    y = jnp.asarray(ctx.fp.encode([pt[1] for pt in pts]))
    return x, y


def g2_points(ctx, fp2, ks):
    nr = ctx.params.fp2_nonresidue
    g2h = ctx.g2_aff
    pts = [rm.ec2_mul(k, g2h, (0, 0), nr, ctx.p) for k in ks]
    x = jnp.asarray(np.stack([fp2.encode(list(pt[0])) for pt in pts]))
    y = jnp.asarray(np.stack([fp2.encode(list(pt[1])) for pt in pts]))
    return x, y


def test_bilinearity(pr):
    ctx = pr.ctx
    r = ctx.r
    rng = random.Random(17)
    a, b = rng.randrange(2, r), rng.randrange(2, r)
    # e([a]P, [b]Q) == e([ab]P, Q) == e(P, [ab]Q)
    P = g1_points(ctx, [a, a * b % r, 1])
    Q = g2_points(ctx, pr.fp2, [b, 1, a * b % r])
    gt = pr.pairing(P, Q)
    gt = np.asarray(gt)
    assert (gt[0] == gt[1]).all(), "e([a]P,[b]Q) != e([ab]P, Q)"
    assert (gt[0] == gt[2]).all(), "e([a]P,[b]Q) != e(P, [ab]Q)"


def test_non_degenerate_and_unity(pr):
    ctx = pr.ctx
    P = g1_points(ctx, [1])
    Q = g2_points(ctx, pr.fp2, [1])
    gt = pr.pairing(P, Q)
    one = pr.fp12.broadcast_one((1,))
    assert not np.asarray(pr.fp12.eq(gt, one))[0], "pairing degenerate"
    # gt^r == 1 (GT has order r)
    gtr = pr.fp12.pow_const(gt, ctx.r)
    assert np.asarray(pr.fp12.eq(gtr, one))[0], "GT element order != r"


def test_pairing_check(pr):
    """e(P, Q) * e(-P, Q) == 1 and the KZG-style shifted check."""
    ctx = pr.ctx
    rng = random.Random(23)
    k = rng.randrange(2, ctx.r)
    xP, yP = g1_points(ctx, [k, k])
    yP_neg = ctx.fp.neg(yP[1:2])
    xP = jnp.concatenate([xP[0:1], xP[1:2]], axis=0)
    yP = jnp.concatenate([yP[0:1], yP_neg], axis=0)
    Q = g2_points(ctx, pr.fp2, [5, 5])
    assert bool(np.asarray(pr.pairing_check((xP, yP), Q)))
    # and a failing check
    Q_bad = g2_points(ctx, pr.fp2, [5, 6])
    assert not bool(np.asarray(pr.pairing_check((xP, yP), Q_bad)))


def test_multi_pairing_skip_mask(pr):
    ctx = pr.ctx
    P = g1_points(ctx, [3, 7])
    Q = g2_points(ctx, pr.fp2, [11, 13])
    # skip the second pair -> equals single pairing of the first
    skip = jnp.asarray([False, True])
    gt = pr.multi_pairing(P, Q, skip_mask=skip)
    gt1 = pr.pairing((P[0][:1], P[1][:1]), (Q[0][:1], Q[1][:1]))
    assert (np.asarray(gt) == np.asarray(gt1)[0]).all()


def test_miller_accumulator(pr):
    """Streaming accumulator == one-shot multi_pairing over the same pairs
    (reference: pairings/miller_accumulators.nim batch-of-8 semantics)."""
    from constantine_tpu.ops.pairing import MillerAccumulator
    ctx = pr.ctx
    P = g1_points(ctx, [3, 7, 9])
    Q = g2_points(ctx, pr.fp2, [11, 13, 2])
    acc = MillerAccumulator(pr, batch=2)   # force a mid-stream handover
    acc.update((P[0][:2], P[1][:2]), (Q[0][:2], Q[1][:2]))
    acc.update((P[0][2:], P[1][2:]), (Q[0][2:], Q[1][2:]))
    got = acc.finish()
    want = pr.multi_pairing(P, Q)
    assert (np.asarray(got) == np.asarray(want)).all()


def test_miller_accumulator_is_one(pr):
    ctx = pr.ctx
    from constantine_tpu.ops.pairing import MillerAccumulator
    xP, yP = g1_points(ctx, [4, 4])
    yP = jnp.concatenate([yP[0:1], ctx.fp.neg(yP[1:2])], axis=0)
    Q = g2_points(ctx, pr.fp2, [6, 6])
    acc = MillerAccumulator(pr)
    acc.update((xP, yP), Q)
    assert bool(np.asarray(acc.is_one()))


def test_lowlevel_facade():
    """lowlevel re-exports resolve (reference lowlevel_*.nim parity)."""
    from constantine_tpu import lowlevel as ll
    assert ll.get_curve("BN254_Snarks").p.bit_length() == 254
    assert callable(ll.msm) and callable(ll.get_pairing)
    F = ll.get_field("BLS12_381.Fr")
    one = F.encode([1])
    assert F.decode(one) == [1]
