"""Endomorphism-accelerated subgroup checks (ops/subgroups.py) vs host
reference math: in-subgroup positives, on-curve-but-not-in-subgroup
negatives (the small-subgroup-attack inputs the checks exist to reject).
Mirrors the reference's zoo_subgroups test posture."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.subgroups import is_in_subgroup_g1, is_in_subgroup_g2
from constantine_tpu.utils import refmath as rm


def test_g1_membership():
    ctx = get_curve("BLS12_381")
    rng = random.Random(1)
    good = [rm.ec_mul(k, ctx.g, 0, ctx.p) for k in (1, 2, 3, 0xDEADBEEF)]
    bad = []
    while len(bad) < 3:
        x = rng.randrange(ctx.p)
        y = rm.sqrt_mod((x * x * x + 4) % ctx.p, ctx.p)
        if y is None:
            continue
        if rm.ec_mul(ctx.r, (x, y), 0, ctx.p) is not None:
            bad.append((x, y))
    pts = good + bad
    px = jnp.asarray(ctx.fp.encode([q[0] for q in pts]))
    py = jnp.asarray(ctx.fp.encode([q[1] for q in pts]))
    got = np.asarray(is_in_subgroup_g1(ctx, ctx.g1.from_affine((px, py))))
    assert got.tolist() == [True] * len(good) + [False] * len(bad)


def test_g1_infinity_in_subgroup():
    ctx = get_curve("BLS12_381")
    inf = ctx.g1.infinity((2,))
    got = np.asarray(is_in_subgroup_g1(ctx, inf))
    assert got.tolist() == [True, True]


def test_g2_membership():
    ctx = get_curve("BLS12_381")
    from constantine_tpu.ops.towers import build_tower
    fp2, _, _ = build_tower("BLS12_381")
    nr = ctx.params.fp2_nonresidue
    gen = (ctx.params.g2_gx, ctx.params.g2_gy)
    good = [rm.ec2_mul(k, gen, (0, 0), nr, ctx.p) for k in (1, 5, 77)]
    qx = jnp.asarray(np.stack([fp2.encode(list(q[0])) for q in good]))
    qy = jnp.asarray(np.stack([fp2.encode(list(q[1])) for q in good]))
    got = np.asarray(is_in_subgroup_g2(ctx, ctx.g2.from_affine((qx, qy))))
    assert got.tolist() == [True] * len(good)

    # negatives: SSWU map-to-curve outputs BEFORE cofactor clearing are
    # on the twist but (w.h.p.) outside the r-subgroup — exactly the
    # inputs the check must reject
    from constantine_tpu.models.hash_to_curve import get_h2c
    h2c = get_h2c()
    u = jnp.asarray(np.stack([fp2.encode([123 + i, 456 + i])
                              for i in range(3)]))
    bx, by = h2c.g2_map.map_to_curve(u)
    Q = ctx.g2.from_affine((bx, by))
    assert bool(np.all(np.asarray(ctx.g2.is_on_curve(Q))))
    gotb = np.asarray(is_in_subgroup_g2(ctx, Q))
    assert not bool(gotb.any())
    # and after cofactor clearing the same points must pass
    cleared = h2c._clear_g2(Q)
    gotc = np.asarray(is_in_subgroup_g2(ctx, cleared))
    assert bool(gotc.all())
