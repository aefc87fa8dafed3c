"""Windowed / dispatched scalar multiplication vs host reference math.

Mirrors the reference's scalar-mul property tests
(tests/math_elliptic_curves/t_ec_shortw_jac_g1_mul_vs_ref.nim and the
sage-vector harness t_ec_sage_template.nim): [k]P computed by the windowed
kernels must match host-side python-int EC math for random and edge-case
scalars (0, 1, r-1, small, 2^64-1).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.scalar_mul import (
    scalar_mul_windowed, scalar_mul_vartime, scalar_mul_dispatch,
    _signed_window_digits)
from constantine_tpu.utils import refmath as rm


@pytest.fixture(scope="module")
def ctx():
    return get_curve("BLS12_381")


def _setup(ctx, ks):
    pts = [rm.ec_mul(i + 2, ctx.g, 0, ctx.p) for i in range(len(ks))]
    px = jnp.asarray(ctx.fp.encode([p[0] for p in pts]))
    py = jnp.asarray(ctx.fp.encode([p[1] for p in pts]))
    sl = jnp.asarray(ctx.scalars_to_limbs(ks))
    return pts, px, py, sl


def _check(ctx, R, ks, pts, mod):
    (gx, gy), inf = ctx.g1.to_affine(R)
    gx = ctx.fp.decode(gx)
    gy = ctx.fp.decode(gy)
    inf = np.asarray(inf)
    for i, (k, pt) in enumerate(zip(ks, pts)):
        exp = rm.ec_mul(k % mod, pt, 0, ctx.p)
        if exp is None:
            assert inf[i]
        else:
            assert not inf[i] and gx[i] == exp[0] and gy[i] == exp[1]


def test_signed_digit_recoding_roundtrip(ctx):
    ks = [0xdeadbeefcafe1234, 5, 1, 0, (1 << 64) - 1, (1 << 63) + 7]
    sl = jnp.asarray(ctx.scalars_to_limbs(ks))[:, :4]
    for c in (3, 4, 5, 7):
        W = -(-65 // c)
        digs, carry = _signed_window_digits(sl, c, W)
        digs = [np.asarray(d) for d in digs]
        assert not np.asarray(carry).any()
        half = 1 << (c - 1)
        for j, k in enumerate(ks):
            rec = sum(int(digs[w][j]) << (c * w) for w in range(W))
            assert rec == k
            assert all(abs(int(digs[w][j])) <= half for w in range(W))


def test_windowed_full_width(ctx):
    rng = np.random.default_rng(11)
    ks = [int.from_bytes(rng.bytes(32), "big") % ctx.r for _ in range(3)]
    ks += [0, 1, ctx.r - 1]
    pts, px, py, sl = _setup(ctx, ks)
    P = ctx.g1.from_affine((px, py))
    R = scalar_mul_windowed(ctx.g1, sl, P, c=5, scalar_bits=255)
    _check(ctx, R, ks, pts, 2 * ctx.r)


def test_vartime_dispatch_small(ctx):
    ks = [3, 65537, (1 << 64) - 1, 12345678901234567]
    pts, px, py, sl = _setup(ctx, ks)
    P = ctx.g1.from_affine((px, py))
    R = scalar_mul_vartime(ctx.g1, sl[:, :4], P, scalar_bits=64)
    _check(ctx, R, ks, pts, 1 << 64)


def test_dispatch_glv(ctx):
    rng = np.random.default_rng(13)
    ks = [int.from_bytes(rng.bytes(32), "big") % ctx.r for _ in range(2)] + [1]
    pts, px, py, sl = _setup(ctx, ks)
    R = scalar_mul_dispatch(ctx, sl, (px, py))
    _check(ctx, R, ks, pts, ctx.r)
