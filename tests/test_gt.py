"""GT (pairing target group) tests: exponentiation and multiexp vs
pairing bilinearity — the reference gates with
tests/math_pairings/t_pairing_bls12_381_gt_exp.nim and t_gt_multiexp
equivalents."""

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.gt import get_gt
from constantine_tpu.utils import refmath as rm


@pytest.fixture(scope="module")
def setup():
    ctx = get_curve("BLS12_381")
    gt = get_gt("BLS12_381")
    pr = gt.pr
    # GT generator: e(G1, G2)
    g1 = ctx.g1_gen
    g2 = ctx.g2_gen
    f = pr.pairing(g1, g2)
    return ctx, gt, pr, f


def test_gt_exp_matches_pairing_bilinearity(setup):
    ctx, gt, pr, f = setup
    ks = [5, 123456789, ctx.r - 2]
    kl = jnp.asarray(ctx.scalars_to_limbs(ks))
    fs = jnp.broadcast_to(f, (3,) + f.shape[1:])
    powed = gt.exp(kl, fs, exp_bits=255)
    # e(G1,G2)^k == e([k]G1, G2)
    n = len(ks)
    G = ctx.g1.from_affine(tuple(
        jnp.broadcast_to(g, (n,) + g.shape[1:]) for g in ctx.g1_gen))
    kP = ctx.g1.scalar_mul(kl, G, scalar_bits=255)
    (px, py), _ = ctx.g1.to_affine(kP)
    g2x = jnp.broadcast_to(ctx.g2_gen[0], (n,) + ctx.g2_gen[0].shape[1:])
    g2y = jnp.broadcast_to(ctx.g2_gen[1], (n,) + ctx.g2_gen[1].shape[1:])
    expected = pr.pairing((px, py), (g2x, g2y))
    assert np.asarray(gt.fp12.eq(powed, expected)).all()


def test_gt_exp_identities(setup):
    ctx, gt, pr, f = setup
    # f^r == 1 (GT has order r) and f^1 == f
    rl = jnp.asarray(ctx.scalars_to_limbs([ctx.r, 1]))
    fs = jnp.broadcast_to(f, (2,) + f.shape[1:])
    out = gt.exp(rl, fs, exp_bits=256)
    one = gt.fp12.broadcast_one((1,))
    assert np.asarray(gt.fp12.eq(out[:1], one)).all()
    assert np.asarray(gt.fp12.eq(out[1:], f)).all()


def test_gt_subgroup_check(setup):
    ctx, gt, pr, f = setup
    ok = gt.is_in_subgroup(f)
    assert np.asarray(ok).all()
    # a non-GT element (plain Fp12 value) must fail
    junk = gt.fp12.broadcast_one((1,)).at[..., 0, 0].set(12345)
    assert not np.asarray(gt.is_in_subgroup(junk)).any()


def test_gt_multiexp_vs_exp(setup):
    ctx, gt, pr, f = setup
    # fs[i] = f^(i+1); prod fs[i]^k_i == f^(sum (i+1) k_i)
    idx = jnp.asarray(ctx.scalars_to_limbs([1, 2, 3, 4]))
    fs = gt.exp(idx, jnp.broadcast_to(f, (4,) + f.shape[1:]), exp_bits=4)
    ks = [7, 1 << 62, 123, ctx.r - 1]
    kl = jnp.asarray(ctx.scalars_to_limbs(ks))
    got = gt.multiexp(fs, kl, c=4, exp_bits=255)
    ktot = sum((i + 1) * k for i, k in enumerate(ks)) % ctx.r
    exp = gt.exp(jnp.asarray(ctx.scalars_to_limbs([ktot])),
                 f, exp_bits=255)
    assert np.asarray(gt.fp12.eq(got[None], exp)).all()
