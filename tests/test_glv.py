"""GLV endomorphism decomposition tests.

Mirrors the reference's endomorphism checks (sage-generated scalar-mul
vectors exercise scalarMulEndo; here we differential-test the device
decomposition against host ints and the GLV scalar-mul/MSM against plain
reference math)."""

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops import limbs as lb
from constantine_tpu.ops.glv import get_glv, msm_glv, scalar_mul_glv
from constantine_tpu.utils import refmath as rm


@pytest.mark.parametrize("name", ["BLS12_381", "BN254_Snarks", "Secp256k1"])
def test_decompose_device_vs_host(name):
    ctx = get_curve(name)
    glv = get_glv(name)
    rng = np.random.default_rng(7)
    ks = [int.from_bytes(rng.bytes(32), "big") % ctx.r for _ in range(32)]
    ks += [0, 1, ctx.r - 1, glv.lam, ctx.r - glv.lam]
    kl = jnp.asarray(ctx.scalars_to_limbs(ks))
    k1, n1, k2, n2 = glv.decompose(kl)
    for i, k in enumerate(ks):
        h1, h2 = glv._decompose_host(k)
        d1 = lb.limbs_to_int(np.asarray(k1[i])) * (-1 if bool(n1[i]) else 1)
        d2 = lb.limbs_to_int(np.asarray(k2[i])) * (-1 if bool(n2[i]) else 1)
        assert (d1, d2) == (h1, h2)
        assert (d1 + d2 * glv.lam - k) % ctx.r == 0
        assert max(abs(d1), abs(d2)) < (1 << glv.mini_bits)


def test_scalar_mul_glv_matches_reference():
    ctx = get_curve("BLS12_381")
    rng = np.random.default_rng(3)
    n = 4
    ks = [int.from_bytes(rng.bytes(32), "big") % ctx.r for _ in range(n)]
    pts = [rm.ec_mul(j + 1, ctx.g, 0, ctx.p) for j in range(n)]
    px = jnp.asarray(ctx.fp.encode([p[0] for p in pts]))
    py = jnp.asarray(ctx.fp.encode([p[1] for p in pts]))
    kl = jnp.asarray(ctx.scalars_to_limbs(ks))
    got = scalar_mul_glv(ctx, kl, (px, py))
    (gx, gy), _ = ctx.g1.to_affine(got)
    for i in range(n):
        exp = rm.ec_mul(ks[i], pts[i], 0, ctx.p)
        assert ctx.fp.decode(gx[i]) == exp[0]
        assert ctx.fp.decode(gy[i]) == exp[1]


def test_msm_glv_matches_naive_sum():
    ctx = get_curve("BLS12_381")
    rng = np.random.default_rng(5)
    n = 32
    ks = [int.from_bytes(rng.bytes(32), "big") % ctx.r for _ in range(n)]
    pts = [rm.ec_mul(int(v), ctx.g, 0, ctx.p)
           for v in rng.integers(1, 2**30, size=n)]
    px = jnp.asarray(ctx.fp.encode([p[0] for p in pts]))
    py = jnp.asarray(ctx.fp.encode([p[1] for p in pts]))
    kl = jnp.asarray(ctx.scalars_to_limbs(ks))
    got = msm_glv(ctx, (px, py), kl, c=6, use_pallas=False)
    (gx, gy), _ = ctx.g1.to_affine(tuple(t[None] for t in got))
    exp = None
    for k, pt in zip(ks, pts):
        exp = rm.ec_add(exp, rm.ec_mul(k, pt, 0, ctx.p), 0, ctx.p)
    assert ctx.fp.decode(gx)[0] == exp[0]
    assert ctx.fp.decode(gy)[0] == exp[1]


# ---------------------------------------------------------------------------
# GLS-4 (G2) — split_scalars.nim:95-125 m=4 analogue
# ---------------------------------------------------------------------------


def test_gls4_decompose_device_vs_host():
    from constantine_tpu.ops.glv import get_gls4
    ctx = get_curve("BLS12_381")
    gls = get_gls4("BLS12_381")
    rng = np.random.default_rng(11)
    ks = [int.from_bytes(rng.bytes(32), "big") % ctx.r for _ in range(16)]
    ks += [0, 1, ctx.r - 1, gls.lam]
    kl = jnp.asarray(ctx.scalars_to_limbs(ks))
    parts = gls.decompose(kl)
    for i, k in enumerate(ks):
        hs = gls._decompose_host(k)
        acc = 0
        for j in range(4):
            kj, neg = parts[j]
            d = lb.limbs_to_int(np.asarray(kj[i]))
            d = -d if bool(neg[i]) else d
            assert d == hs[j], (i, j, d, hs[j])
            acc += d * pow(gls.lam, j, ctx.r)
        assert (acc - k) % ctx.r == 0


def test_gls4_scalar_mul_g2():
    from constantine_tpu.ops.glv import scalar_mul_gls4_g2
    ctx = get_curve("BLS12_381")
    from constantine_tpu.ops.towers import build_tower
    fp2 = build_tower("BLS12_381")[0]
    nr = ctx.params.fp2_nonresidue
    rng = np.random.default_rng(5)
    ks = [int(k) for k in rng.integers(2, 2**60, size=4)]
    pts = [rm.ec2_mul(k, ctx.g2_aff, (0, 0), nr, ctx.p) for k in ks]
    qx = jnp.asarray(np.stack([fp2.encode(list(q[0])) for q in pts]))
    qy = jnp.asarray(np.stack([fp2.encode(list(q[1])) for q in pts]))
    scalars = [int.from_bytes(rng.bytes(32), "big") % ctx.r
               for _ in range(3)] + [1]
    sl = jnp.asarray(ctx.scalars_to_limbs(scalars))
    got = scalar_mul_gls4_g2(ctx, sl, (qx, qy))
    (gx, gy), inf = ctx.g2.to_affine(got)
    for i in range(4):
        want = rm.ec2_mul(scalars[i], pts[i], (0, 0), nr, ctx.p)
        gxi = fp2.decode(np.asarray(gx[i]))
        gyi = fp2.decode(np.asarray(gy[i]))
        assert tuple(gxi) == tuple(want[0]), i
        assert tuple(gyi) == tuple(want[1]), i
