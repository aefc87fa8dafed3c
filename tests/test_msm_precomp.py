"""Precomputed fixed-base MSM vs naive host reference.

Mirrors the reference's t_ec_shortw_jac_g1_msm.nim property test applied to
the PrecomputedMSM path (ec_multi_scalar_mul_precomp.nim:18-214 analogue):
sum_i k_i P_i computed through the stride tables must equal the host-side
python-int sum for random scalars, including zeros and r-1.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.msm_precomp import PrecomputedMSM, best_precomp_window
from constantine_tpu.utils import refmath as rm


@pytest.fixture(scope="module")
def ctx():
    return get_curve("BLS12_381")


def test_best_precomp_window_monotone():
    assert 6 <= best_precomp_window(64) <= best_precomp_window(1 << 20) <= 16


def test_precomp_msm_matches_reference(ctx):
    rng = np.random.default_rng(5)
    n = 16
    ks = [int.from_bytes(rng.bytes(32), "big") % ctx.r for _ in range(n - 2)]
    ks += [0, ctx.r - 1]
    pts = [rm.ec_mul(i + 2, ctx.g, 0, ctx.p) for i in range(n)]
    px = jnp.asarray(ctx.fp.encode([p[0] for p in pts]))
    py = jnp.asarray(ctx.fp.encode([p[1] for p in pts]))
    sl = jnp.asarray(ctx.scalars_to_limbs(ks))

    pm = PrecomputedMSM(ctx.g1, (px, py), c=7, scalar_bits=255)
    got = pm(sl)
    (gx, gy), inf = ctx.g1.to_affine(tuple(t[None] for t in got))

    exp = None
    for k, pt in zip(ks, pts):
        exp = rm.ec_add(exp, rm.ec_mul(k, pt, 0, ctx.p), 0, ctx.p)
    assert not np.asarray(inf)[0]
    assert ctx.fp.decode(gx)[0] == exp[0]
    assert ctx.fp.decode(gy)[0] == exp[1]


def test_precomp_tables_are_shifted_bases(ctx):
    n = 4
    pts = [rm.ec_mul(i + 3, ctx.g, 0, ctx.p) for i in range(n)]
    px = jnp.asarray(ctx.fp.encode([p[0] for p in pts]))
    py = jnp.asarray(ctx.fp.encode([p[1] for p in pts]))
    pm = PrecomputedMSM(ctx.g1, (px, py), c=6, scalar_bits=24)
    tx, ty = pm._tables
    assert tx.shape[0] == pm.W * n
    # layer j row i must equal [2^(c*j)]P_i
    xs = ctx.fp.decode(tx)
    for j in range(pm.W):
        for i in range(n):
            exp = rm.ec_mul(1 << (pm.c * j), pts[i], 0, ctx.p)
            assert xs[j * n + i] == exp[0]
