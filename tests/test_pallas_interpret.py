"""Interpreter-mode differential tests for the Pallas kernel field (_KF).

The fused EC kernels are too slow to interpret on CPU (see
test_pallas_tpu.py), but the FIELD primitives inside them (mul/sq/add/sub)
interpret in seconds at a tiny block width — this is the CPU-side
correctness gate for kernel-internal arithmetic (the reference's
t_finite_fields.nim role for the hot-path backend, cross-checked against
host python ints)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.pallas_ec import _KF, _CPARAMS

TB = 8


@pytest.fixture(scope="module")
def setup():
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    L = F.L
    consts = np.zeros((2, L, 1), np.uint32)
    consts[0, :, 0] = F.p
    consts[1, :, 0] = F.one
    p_limbs = tuple(int(v) for v in F.p)

    def kern(a_ref, b_ref, c_ref, osq_ref, omul_ref, oadd_ref, osub_ref,
             t_ref):
        kf = _KF(L, p_limbs, np.uint32(F.m0ninv), c_ref[0], c_ref[1], t_ref)
        a = a_ref[:, :]
        b = b_ref[:, :]
        osq_ref[:, :] = kf.sq(a)
        omul_ref[:, :] = kf.mul(a, b)
        oadd_ref[:, :] = kf.add(a, b)
        osub_ref[:, :] = kf.sub(a, b)

    spec = pl.BlockSpec((L, TB), lambda: (0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kern,
        in_specs=[spec, spec,
                  pl.BlockSpec((2, L, 1), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((L, TB), jnp.uint32)] * 4,
        scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32)],
        interpret=True, compiler_params=_CPARAMS)
    return ctx, F, fn, consts


def test_kernel_field_vs_host_ints(setup):
    ctx, F, fn, consts = setup
    rng = np.random.default_rng(7)
    av = [int.from_bytes(rng.bytes(47), "big") % ctx.p for _ in range(TB)]
    bv = [int.from_bytes(rng.bytes(47), "big") % ctx.p for _ in range(TB)]
    # edge values: 0, 1, p-1, and a symmetric pair
    av[0], av[1], av[2], av[3] = 0, 1, ctx.p - 1, bv[3]
    bv[0], bv[2] = ctx.p - 1, ctx.p - 1
    aT = np.asarray(F.encode(av)).T.copy()
    bT = np.asarray(F.encode(bv)).T.copy()
    osq, omul, oadd, osub = fn(jnp.asarray(aT), jnp.asarray(bT),
                               jnp.asarray(consts))
    p = ctx.p
    assert F.decode(np.asarray(osq).T) == [a * a % p for a in av]
    assert F.decode(np.asarray(omul).T) == \
        [a * b % p for a, b in zip(av, bv)]
    assert F.decode(np.asarray(oadd).T) == \
        [(a + b) % p for a, b in zip(av, bv)]
    assert F.decode(np.asarray(osub).T) == \
        [(a - b) % p for a, b in zip(av, bv)]
