"""Pallas TPU kernels for the field hot path.

Fused Montgomery multiplication: the XLA path (ops/field.py) lowers each
CIOS step as separate vector ops with HBM-visible intermediates between
fusion boundaries; this kernel keeps the whole (L+1)-row accumulator in
VMEM/registers for a block of lanes, reading a/b once and writing the
result once — the speed-of-light pattern for an HBM-bandwidth-bound op.

Layout: limb-major (L, B): limbs ride the sublane axis (3 packed 8-sublane
tiles for L=24), batch rides the lanes. Transposes at the boundary are
cheap relative to the mul chain and amortize across fused call sites.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import MASK, WORD_BITS
# Shared compiler params (raised scoped-vmem limit) live in pallas_ec.
from .pallas_ec import _CPARAMS


def _mont_mul_kernel(L, p_limbs, m0, a_ref, b_ref, out_ref):
    a = a_ref[:, :]                      # (L, TB)
    b = b_ref[:, :]
    TB = a.shape[1]
    zrow = jnp.zeros((1, TB), jnp.uint32)
    t = jnp.zeros((L + 1, TB), jnp.uint32)
    for i in range(L):
        prod = a[i:i + 1, :] * b         # (L, TB), exact in uint32
        lo = prod & MASK
        hi = prod >> WORD_BITS
        t = t + jnp.concatenate([lo, zrow], 0) \
              + jnp.concatenate([zrow, hi], 0)
        m = (t[0:1, :] * m0) & MASK      # (1, TB)
        # p rows as python-scalar constants (pallas kernels cannot capture
        # array constants)
        prod2 = jnp.concatenate(
            [m * np.uint32(p_limbs[j]) for j in range(L)], 0)  # (L, TB)
        lo2 = prod2 & MASK
        hi2 = prod2 >> WORD_BITS
        t = t + jnp.concatenate([lo2, zrow], 0) \
              + jnp.concatenate([zrow, hi2], 0)
        carry = t[0:1, :] >> WORD_BITS
        t = jnp.concatenate([t[1:, :] , zrow], 0)
        t = jnp.concatenate([t[0:1, :] + carry, t[1:, :]], 0)
    # ripple normalize (t rows < 2^23)
    rows = [t[i, :] for i in range(L + 1)]
    for i in range(L):
        carry = rows[i] >> WORD_BITS
        rows[i] = rows[i] & MASK
        rows[i + 1] = rows[i + 1] + carry
    # conditional subtract p (value < 2p)
    hi_bit = rows[L]
    borrow = jnp.zeros((TB,), jnp.uint32)
    diff = []
    c = jnp.ones((TB,), jnp.uint32)
    for i in range(L):
        s = rows[i] + (MASK - np.uint32(p_limbs[i])) + c
        diff.append(s & MASK)
        c = s >> WORD_BITS
    take_d = (hi_bit == 1) | (c == 1)
    out = [jnp.where(take_d, d, r) for d, r in zip(diff, rows[:L])]
    out_ref[:, :] = jnp.stack(out, axis=0)


class PallasMontMul:
    """Batched Montgomery mul via a fused Pallas kernel. Operates on the
    standard (B, L) layout (transposing internally)."""

    def __init__(self, field, block: int = 512):
        self.F = field
        self.L = field.L
        self.block = block
        kern = functools.partial(_mont_mul_kernel, self.L,
                                 tuple(int(v) for v in field.p),
                                 np.uint32(field.m0ninv))
        L, TB = self.L, block

        def run_t(aT, bT):
            n = aT.shape[1]
            grid = (n // TB,)
            return pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((L, TB), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((L, TB), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((L, TB), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
                compiler_params=_CPARAMS,
            )(aT, bT)

        self._run_t = jax.jit(run_t)
        self.mul = jax.jit(self.mul)

    def mul(self, a, b):
        """(batch..., L) x (batch..., L) -> (batch..., L), same semantics as
        Field.mul (either operand may broadcast against the other). Batch is
        padded to a block multiple."""
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        n = int(np.prod(shape[:-1]))
        import os
        min_lanes = int(os.environ.get("CTT_PALLAS_MIN", "0"))
        if n < min_lanes and hasattr(self.F, "_xla_mul"):
            # optional floor: below it, keep the XLA lowering. Default 0:
            # even a 16-lane mul padded to one 512-lane block beats the
            # ~100 XLA ops of the unfused lowering on device (each tiny
            # HLO op costs ~1us; the padded kernel is one op).
            return self.F._xla_mul(a, b)
        aT = jnp.broadcast_to(a, shape).reshape(n, self.L).T
        bT = jnp.broadcast_to(b, shape).reshape(n, self.L).T
        pad = (-n) % self.block
        if pad:
            aT = jnp.pad(aT, ((0, 0), (0, pad)))
            bT = jnp.pad(bT, ((0, 0), (0, pad)))
        outT = self._run_t(aT, bT)
        return outT[:, :n].T.reshape(shape)
