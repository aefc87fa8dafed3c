"""MSM tests vs naive host reference (mirrors
tests/math_elliptic_curves/t_ec_shortw_jac_g1_msm.nim: MSM == sum of
per-point scalar muls, several sizes, edge cases)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.msm import msm, best_window_size
from constantine_tpu.utils import refmath as rm


def setup_points(ctx, n, seed=0, zero_scalars=()):
    rng = random.Random(seed)
    ks = [rng.randrange(1, ctx.r) for _ in range(n)]
    pts = [rm.ec_mul(k, ctx.g, ctx.params.a, ctx.p) for k in ks]
    scalars = [rng.randrange(ctx.r) for _ in range(n)]
    for i in zero_scalars:
        scalars[i] = 0
    px = jnp.asarray(ctx.fp.encode([pt[0] for pt in pts]))
    py = jnp.asarray(ctx.fp.encode([pt[1] for pt in pts]))
    slimbs = jnp.asarray(ctx.scalars_to_limbs(scalars))
    # host expected
    exp = None
    for k, pt in zip(scalars, pts):
        exp = rm.ec_add(exp, rm.ec_mul(k, pt, ctx.params.a, ctx.p),
                        ctx.params.a, ctx.p)
    return (px, py), slimbs, exp


def decode_point(ctx, P):
    (x, y), inf = ctx.g1.to_affine(tuple(p[None] for p in P))
    if np.asarray(inf)[0]:
        return None
    return (ctx.fp.decode(x)[0], ctx.fp.decode(y)[0])


@pytest.mark.parametrize("n", [1, 2, 7, 64, 300])
def test_msm_vs_naive(n):
    ctx = get_curve("BLS12_381")
    pts, slimbs, exp = setup_points(ctx, n, seed=n)
    got = decode_point(ctx, msm(ctx.g1, pts, slimbs, scalar_bits=255))
    assert got == exp


def test_msm_zero_scalars_and_dupes():
    ctx = get_curve("BLS12_381")
    n = 32
    pts, slimbs, exp = setup_points(ctx, n, seed=5, zero_scalars=(0, 3, 31))
    got = decode_point(ctx, msm(ctx.g1, pts, slimbs, scalar_bits=255))
    assert got == exp
    # duplicate points with equal scalars (forces doubling path in buckets)
    px, py = pts
    px2 = jnp.concatenate([px, px], axis=0)
    py2 = jnp.concatenate([py, py], axis=0)
    s2 = jnp.concatenate([slimbs, slimbs], axis=0)
    got = decode_point(ctx, msm(ctx.g1, (px2, py2), s2, scalar_bits=255))
    exp2 = None
    exp_pt = exp
    # expected = 2 * previous sum... but zero_scalars made exp partial; just
    # compare against doubling of the host expected sum
    from constantine_tpu.utils.refmath import ec_double
    exp2 = ec_double(exp_pt, ctx.params.a, ctx.p)
    assert got == exp2


def test_msm_all_zero():
    ctx = get_curve("BLS12_381")
    pts, slimbs, _ = setup_points(ctx, 16, seed=9)
    z = jnp.zeros_like(slimbs)
    P = msm(ctx.g1, pts, z, scalar_bits=255)
    assert np.asarray(ctx.g1.is_inf(tuple(p[None] for p in P)))[0]


def test_msm_window_sizes():
    ctx = get_curve("BLS12_381")
    pts, slimbs, exp = setup_points(ctx, 50, seed=11)
    for c in (4, 8, 13):
        got = decode_point(ctx, msm(ctx.g1, pts, slimbs, c=c, scalar_bits=255))
        assert got == exp, f"window {c}"


def test_msm_bn254():
    ctx = get_curve("BN254_Snarks")
    pts, slimbs, exp = setup_points(ctx, 40, seed=13)
    got = decode_point(ctx, msm(ctx.g1, pts, slimbs, scalar_bits=254))
    assert got == exp
