"""Batched-inversion kernels (PallasAffine) + msm_tpu edge cases.

Covers the PallasAffine kernels (Montgomery chain batch inversion, Fermat
pow kernel) against host pow(), and one full msm_tpu run (interpret mode
on CPU) against the naive host reference — including the doubling
(duplicate point) and cancellation (P + -P) cases the reference exercises
in t_ec_shortw_jac_g1_msm.nim. (The affine pair-merge MSM accumulation
path these kernels once backed was measured slower than the Jacobian
flush and removed in round 4 — see ops/msm_tpu.py.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.pallas_ec import get_pallas_affine
from constantine_tpu.ops.msm_tpu import msm_tpu
from constantine_tpu.utils import refmath as rm


def _pack(a):
    aT = np.asarray(a).T
    return jnp.asarray(aT[0::2] | (aT[1::2] << 16))


def _unpack_decode(F, packed):
    lo = np.asarray(packed) & 0xFFFF
    hi = np.asarray(packed) >> 16
    L = lo.shape[0] * 2
    unp = np.empty((L, lo.shape[1]), np.uint32)
    unp[0::2] = lo
    unp[1::2] = hi
    return F.decode(jnp.asarray(unp.T))


def test_fermat_inv_kernel():
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    pa = get_pallas_affine(F)
    rng = np.random.default_rng(0)
    vals = [int(v) % ctx.p for v in rng.integers(1, 2**63, size=8)]
    inv = pa.fermat_inv(_pack(F.encode(vals)))
    got = _unpack_decode(F, inv)[:8]
    assert got == [pow(v, -1, ctx.p) for v in vals]


def test_batch_inv_chain():
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    pa = get_pallas_affine(F)
    rng = np.random.default_rng(1)
    n = 16384
    vals = [int(v) % ctx.p for v in rng.integers(1, 2**63, size=64)] * 256
    inv = pa.batch_inv_packed(_pack(F.encode(vals)))
    got = _unpack_decode(F, inv)
    for i in (0, 63, 64, 8191, 16383):
        assert got[i] == pow(vals[i], -1, ctx.p)


@pytest.mark.skipif(
    __import__("jax").default_backend() == "cpu",
    reason="msm_tpu flush in interpreter mode takes >10 min; the XLA MSM "
           "path covers these edge cases on CPU (test_msm.py), and the "
           "TPU run + scripts/check_msm_tpu.py cover the kernel path")
def test_msm_tpu_end_to_end_edge_cases():
    ctx = get_curve("BLS12_381")
    rng = np.random.default_rng(3)
    n = 64
    ks = [(int(v) * 0x123456789ABCDEF123456789ABCDEF1 + 7) % ctx.r
          for v in rng.integers(1, 2**62, size=n)]
    ks[0] = 0
    ks[5] = ks[6]
    pts = [rm.ec_mul(k + 1, ctx.g, 0, ctx.p) for k in range(n)]
    pts[5] = pts[6]                       # duplicate -> bucket doubling
    pts[1] = (pts[2][0], ctx.p - pts[2][1])
    ks[1] = ks[2]                         # P + -P with equal scalar
    px = jnp.asarray(ctx.fp.encode([p[0] for p in pts]))
    py = jnp.asarray(ctx.fp.encode([p[1] for p in pts]))
    sc = jnp.asarray(ctx.scalars_to_limbs(ks))
    # block=128 keeps the interpret-mode (CPU) runtime bounded; the TPU
    # run exercises the full-size defaults.
    res = msm_tpu(ctx.g1, (px, py), sc, scalar_bits=255, block=128)
    (rx, ry), inf = ctx.g1.to_affine(tuple(v[None] for v in res))
    acc = None
    for k, p in zip(ks, pts):
        if k:
            acc = rm.ec_add(acc, rm.ec_mul(k, p, 0, ctx.p), 0, ctx.p)
    got = (ctx.fp.decode(rx)[0], ctx.fp.decode(ry)[0])
    assert got == acc
