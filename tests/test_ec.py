"""Elliptic-curve group law property tests vs host reference math.

Mirrors the reference's EC suites (tests/math_elliptic_curves/
t_ec_shortw_jac_g1_add_double.nim, t_ec_shortw_jac_g1_mul_vs_ref.nim,
t_ec_sage_* vectors): add/double consistency, mixed-add vs add, scalar mul
vs python-int reference, on-curve checks, infinity/edge cases.
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.utils import refmath as rm
from constantine_tpu.ops import limbs as lb


CURVES = ["BLS12_381", "BN254_Snarks", "Secp256k1", "P256", "Pallas"]


def host_points(ctx, ks):
    """[k]G for python ints ks, as affine python-int pairs."""
    return [rm.ec_mul(k, ctx.g, ctx.a if ctx.params.a >= 0 else ctx.params.a,
                      ctx.p) for k in ks]


def to_device_affine(ctx, pts):
    xs = ctx.fp.encode([pt[0] for pt in pts])
    ys = ctx.fp.encode([pt[1] for pt in pts])
    return jnp.asarray(xs), jnp.asarray(ys)


def decode_affine(ctx, P):
    (x, y), inf = ctx.g1.to_affine(P)
    xs = ctx.fp.decode(x)
    ys = ctx.fp.decode(y)
    infs = np.asarray(inf)
    if not isinstance(xs, list):
        xs, ys, infs = [xs], [ys], [infs]
    return [None if i else (a, b) for a, b, i in zip(xs, ys, infs)]


@pytest.mark.parametrize("curve", CURVES)
def test_add_double_vs_ref(curve):
    ctx = get_curve(curve)
    a_coeff = ctx.params.a
    rng = random.Random(21)
    ks = [rng.randrange(2, ctx.r) for _ in range(8)]
    ls = [rng.randrange(2, ctx.r) for _ in range(8)]
    P_host = host_points(ctx, ks)
    Q_host = host_points(ctx, ls)
    P = ctx.g1.from_affine(to_device_affine(ctx, P_host))
    Q = ctx.g1.from_affine(to_device_affine(ctx, Q_host))

    got = decode_affine(ctx, ctx.g1.add(P, Q))
    exp = [rm.ec_add(p, q, a_coeff, ctx.p) for p, q in zip(P_host, Q_host)]
    assert got == exp

    got = decode_affine(ctx, ctx.g1.double(P))
    exp = [rm.ec_double(p, a_coeff, ctx.p) for p in P_host]
    assert got == exp

    # mixed add matches full add
    got = decode_affine(ctx, ctx.g1.madd(P, to_device_affine(ctx, Q_host)))
    exp = [rm.ec_add(p, q, a_coeff, ctx.p) for p, q in zip(P_host, Q_host)]
    assert got == exp

    assert np.asarray(ctx.g1.is_on_curve(P)).all()


@pytest.mark.parametrize("curve", ["BLS12_381", "BN254_Snarks"])
def test_edge_cases(curve):
    """P + (-P) = inf; P + inf = P; inf + inf = inf; add(P, P) = double(P);
    doubling a 2-torsion-free point never hits inf. Mirrors the CT-complete
    law requirements of jacobian.nim:345."""
    ctx = get_curve(curve)
    rng = random.Random(31)
    ks = [rng.randrange(2, ctx.r) for _ in range(4)]
    P_host = host_points(ctx, ks)
    P = ctx.g1.from_affine(to_device_affine(ctx, P_host))
    nP = ctx.g1.neg(P)
    inf = ctx.g1.infinity((4,))

    assert np.asarray(ctx.g1.is_inf(ctx.g1.add(P, nP))).all()
    assert decode_affine(ctx, ctx.g1.add(P, inf)) == P_host
    assert decode_affine(ctx, ctx.g1.add(inf, P)) == P_host
    assert np.asarray(ctx.g1.is_inf(ctx.g1.add(inf, inf))).all()
    # add(P, P) must fall back to double
    got = decode_affine(ctx, ctx.g1.add(P, P))
    exp = [rm.ec_double(p, ctx.params.a, ctx.p) for p in P_host]
    assert got == exp
    # madd edge: P + (-P) affine
    (nx, ny), _ = ctx.g1.to_affine(nP)
    assert np.asarray(ctx.g1.is_inf(ctx.g1.madd(P, (nx, ny)))).all()


@pytest.mark.parametrize("curve", ["BLS12_381", "Secp256k1"])
def test_scalar_mul_vs_ref(curve):
    ctx = get_curve(curve)
    rng = random.Random(41)
    base_ks = [rng.randrange(2, ctx.r) for _ in range(4)]
    muls = [rng.randrange(1, ctx.r) for _ in range(4)]
    P_host = host_points(ctx, base_ks)
    P = ctx.g1.from_affine(to_device_affine(ctx, P_host))
    limbs = jnp.asarray(ctx.scalars_to_limbs(muls))
    got = decode_affine(ctx, ctx.g1.scalar_mul(limbs, P, scalar_bits=ctx.r.bit_length()))
    exp = [rm.ec_mul(m, p, ctx.params.a, ctx.p) for m, p in zip(muls, P_host)]
    assert got == exp
    # edge scalars: 0, 1, r-1, r
    edge = [0, 1, ctx.r - 1, ctx.r]
    limbs = jnp.asarray(lb.ints_to_limbs(edge, ctx.fr.L))
    P1 = ctx.g1.from_affine(to_device_affine(ctx, [P_host[0]] * 4))
    got = decode_affine(ctx, ctx.g1.scalar_mul(limbs, P1))
    exp = [None, P_host[0],
           rm.ec_neg(P_host[0], ctx.p), None]
    assert got == exp


def test_g2_group_law():
    """G2 (over Fp2) group law vs host reference ec2 math."""
    ctx = get_curve("BLS12_381")
    nr = ctx.params.fp2_nonresidue
    g2h = (ctx.params.g2_gx, ctx.params.g2_gy)
    rng = random.Random(51)
    ks = [rng.randrange(2, ctx.r) for _ in range(3)]
    pts = [rm.ec2_mul(k, g2h, (0, 0), nr, ctx.p) for k in ks]

    from constantine_tpu.ops.towers import build_tower
    fp2, _, _ = build_tower("BLS12_381")
    gx = jnp.asarray(np.stack([fp2.encode(list(pt[0])) for pt in pts]))
    gy = jnp.asarray(np.stack([fp2.encode(list(pt[1])) for pt in pts]))
    P = ctx.g2.from_affine((gx, gy))
    assert np.asarray(ctx.g2.is_on_curve(P)).all()

    got_dbl = ctx.g2.double(P)
    (xa, ya), inf = ctx.g2.to_affine(got_dbl)
    exp = [rm.ec2_add(pt, pt, (0, 0), nr, ctx.p) for pt in pts]
    assert fp2.decode(xa) == [list(e[0]) for e in exp]
    assert fp2.decode(ya) == [list(e[1]) for e in exp]

    # scalar mul on G2 matches host
    m = 0xDEADBEEF12345
    limbs = jnp.asarray(ctx.scalars_to_limbs([m] * 3))
    R = ctx.g2.scalar_mul(limbs, P, scalar_bits=60)
    (xa, ya), inf = ctx.g2.to_affine(R)
    exp = [rm.ec2_mul(m, pt, (0, 0), nr, ctx.p) for pt in pts]
    assert fp2.decode(xa) == [list(e[0]) for e in exp]
