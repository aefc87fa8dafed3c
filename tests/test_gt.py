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
    got = gt.multiexp(fs, kl, c=4, exp_bits=255)   # default = torus T2
    ktot = sum((i + 1) * k for i, k in enumerate(ks)) % ctx.r
    exp = gt.exp(jnp.asarray(ctx.scalars_to_limbs([ktot])),
                 f, exp_bits=255)
    assert np.asarray(gt.fp12.eq(got[None], exp)).all()
    # dense Fp12 adapter must agree with the torus path
    dense = gt.multiexp(fs, kl, c=4, exp_bits=255, torus=False)
    assert np.asarray(gt.fp12.eq(got[None], dense[None])).all()


def test_gt_torus_roundtrip_and_laws(setup):
    ctx, gt, pr, f = setup
    from constantine_tpu.ops.gt import T2Group
    t2 = T2Group(pr)
    # compress/decompress roundtrip on f, f^2, f^-1
    f2 = pr.cyclotomic_square(f)
    finv = pr.cyclotomic_inv(f)
    fs = jnp.concatenate([f, f2, finv], axis=0)
    c, ident = t2.compress(fs)
    assert not np.asarray(ident).any()
    back = jnp.stack([t2.decompress((c[i], t2.fp6.broadcast_one(()))
                                    ) for i in range(3)])
    assert np.asarray(gt.fp12.eq(back, fs)).all()
    # torus mul law: decompress(madd(P_f, c_{f2})) == f * f2 = f^3
    P = t2.from_affine((c[0],))
    Q = t2.madd(P, (c[1],))
    f3 = gt.fp12.mul(f[0], f2[0])
    assert np.asarray(gt.fp12.eq(t2.decompress(Q), f3)).all()
    # g * g^-1 collapses to the projective identity (n, 0) — the bucket
    # collision case the torus handles without special-casing
    R = t2.madd(P, (c[2],))
    assert np.asarray(t2.is_inf(R))
    assert np.asarray(gt.fp12.eq(t2.decompress(R),
                                 gt.fp12.broadcast_one(())))


def test_gt_torus_identity_inputs(setup):
    ctx, gt, pr, f = setup
    # an identity basis element with a huge scalar contributes nothing
    one = gt.fp12.broadcast_one((1,))
    fs = jnp.concatenate([f, one, f], axis=0)
    ks = [5, ctx.r - 1, 7]
    kl = jnp.asarray(ctx.scalars_to_limbs(ks))
    got = gt.multiexp(fs, kl, c=4, exp_bits=4 * 16)
    exp = gt.exp(jnp.asarray(ctx.scalars_to_limbs([12])), f, exp_bits=5)
    assert np.asarray(gt.fp12.eq(got[None], exp)).all()
