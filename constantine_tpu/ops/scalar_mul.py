"""Windowed scalar multiplication: CT fixed-window, signed recoding, dispatch.

TPU re-design of the reference's scalar-multiplication family:

* CT fixed-window with table lookup — constantine/math/elliptic/
  ec_scalar_mul.nim:81-171 (scalarMulGeneric + buildLookupTable with
  secretLookup), dispatcher at :438;
* signed-digit recoding — the analogue of the reference's signed windows
  (math/arithmetic/bigints.nim:834 getSignedWindowAt) and the wNAF family
  (ec_scalar_mul_vartime.nim:252-388). True wNAF skips zero digits via
  data-dependent branching, which de-vectorizes on SPMD hardware; the dense
  equivalent with the same table size (2^(c-1) entries, odd+even via sign)
  is the signed fixed window implemented here;
* vartime dispatch by scalar length — ec_scalar_mul_vartime.nim:475
  (scalarMul_vartime picks double-add / small window / endo by bit length).
  On TPU "vartime" and "CT" collapse: everything is branchless by
  construction, so the vartime entry points are the same kernels with the
  table sized by the STATIC scalar_bits bound.

Cost model (b-bit scalars, window c): b doublings + b/c adds + 2^(c-1)
table adds, vs b doublings + b adds for double-and-add. At b=255, c=5:
255 D + 51 A + 16 A ≈ 4x fewer adds than the binary ladder. With the GLV
split (ops/glv.py scalar_mul_glv) the doubling count halves too.

The window table gather is `jnp.take_along_axis` over a stacked point
table — the TPU analogue of the reference's `secretLookup` (scans the
whole table per lookup; constant-time on CPU, simply "a gather" here).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _signed_window_digits(scalars, c: int, n_windows: int):
    """(..., Ls) canonical 16-bit limbs -> list of (...,) int32 signed
    digits, least-significant window first, in [-2^(c-1), 2^(c-1)].

    Dense signed recoding: digit d > 2^(c-1) becomes d - 2^c with a +1
    carry into the next window (bigints.nim:834 analogue, computed with
    lane-wise arithmetic; the carry ripple across windows unrolls at trace
    time — n_windows is static).
    """
    half = 1 << (c - 1)
    full = 1 << c
    raw = []
    for w in range(n_windows):
        bit0 = w * c
        limb_idx = bit0 >> 4
        sh = bit0 & 15
        if limb_idx >= scalars.shape[-1]:
            raw.append(jnp.zeros(scalars.shape[:-1], dtype=jnp.int32))
            continue
        lo = scalars[..., limb_idx].astype(jnp.int32)
        v = lo >> sh
        # window may straddle up to two more 16-bit limbs (c <= 16)
        got = 16 - sh
        while got < c:
            limb_idx += 1
            nxt = (scalars[..., limb_idx].astype(jnp.int32)
                   if limb_idx < scalars.shape[-1]
                   else jnp.zeros_like(lo))
            v = v | (nxt << got)
            got += 16
        raw.append(v & (full - 1))
    digits = []
    carry = jnp.zeros_like(raw[0])
    for w in range(n_windows):
        d = raw[w] + carry
        over = d > half  # strict: keep +2^(c-1), borrow only above it
        d = jnp.where(over, d - full, d)
        carry = over.astype(jnp.int32)
        digits.append(d)
    return digits, carry  # final carry: top window overflow (see caller)


def _build_table(group, P, half: int):
    """Stack [1]P..[half]P along a leading table axis (buildLookupTable
    analogue, ec_scalar_mul.nim:81). P: Jacobian point with batch shape
    (...,). Returns tuple of arrays (half, ..., L)."""
    rows = [P]
    for _ in range(1, half):
        rows.append(group.add(rows[-1], P))
    return tuple(jnp.stack([r[k] for r in rows], axis=0) for k in range(3))


def _gather_batched(table, idx):
    """table arrays are (T, N, ...); idx is (N,). Per-lane gather."""
    out = []
    for t in table:
        ix = idx.reshape((1,) + idx.shape + (1,) * (t.ndim - 2))
        ix = jnp.broadcast_to(ix, (1,) + t.shape[1:])
        out.append(jnp.take_along_axis(t, ix, axis=0)[0])
    return tuple(out)


def scalar_mul_windowed(group, scalar_limbs, P, c: int = 5,
                        scalar_bits: int = None):
    """[k]P via signed fixed-window, batched, branchless.

    group: ECGroup (G1 or G2); scalar_limbs: (N, Ls) canonical 16-bit
    limbs; P: Jacobian point batch (N, ...). Table built per lane.
    Mirrors scalarMulGeneric (ec_scalar_mul.nim:120-171) with the signed
    window trick halving the table.
    """
    F = group.F
    nbits = scalar_bits or scalar_limbs.shape[-1] * 16
    n_windows = -(-(nbits + 1) // c)  # +1: signed recoding can carry out
    half = 1 << (c - 1)

    digits, _ = _signed_window_digits(scalar_limbs, c, n_windows)
    table = _build_table(group, P, half)  # (half, N, ...) rows [1..half]P

    digs = jnp.stack(digits[::-1], axis=0)  # MSW first: (W, N)

    def body(acc, d):
        for _ in range(c):
            acc = group.double(acc)
        mag = jnp.abs(d)
        neg = d < 0
        zero = d == 0
        Q = _gather_batched(table, jnp.maximum(mag - 1, 0))
        Q = group.cneg(neg, Q)
        nxt = group.add(acc, Q)
        return group.select(zero, acc, nxt), None

    init = group.infinity(group._bshape(P[2]))
    acc, _ = jax.lax.scan(body, init, digs)
    return acc


def scalar_mul_vartime(group, scalar_limbs, P, scalar_bits: int = None,
                       c: int = None):
    """Dispatcher mirroring scalarMul_vartime (ec_scalar_mul_vartime.nim:475):
    pick window size by the STATIC bit-length bound. All paths are the same
    branchless kernels (vartime == CT on SPMD hardware)."""
    nbits = scalar_bits or scalar_limbs.shape[-1] * 16
    if c is None:
        c = 2 if nbits < 16 else 3 if nbits < 64 else 4 if nbits < 128 else 5
    if nbits <= 4:
        return group.scalar_mul(scalar_limbs, P, scalar_bits=nbits)
    return scalar_mul_windowed(group, scalar_limbs, P, c=c,
                               scalar_bits=nbits)


def scalar_mul_dispatch(ctx, scalar_limbs, P_aff, scalar_bits: int = 255,
                        c: int = 5):
    """Top-level [k]P dispatcher for G1 of a named curve — the analogue of
    scalarMul (ec_scalar_mul.nim:438): endomorphism-accelerated (GLV) when
    the curve has one, signed fixed window otherwise.

    P_aff: affine (x, y) batch. Returns Jacobian.
    """
    if getattr(ctx.params, "endo_m", 0) or ctx.name in (
            "BLS12_381", "BLS12_377", "BN254_Snarks", "BN254_Nogami",
            "Pallas", "Vesta", "Secp256k1"):
        try:
            from .glv import scalar_mul_glv
            return scalar_mul_glv(ctx, scalar_limbs, P_aff)
        except Exception:
            pass
    return scalar_mul_windowed(ctx.g1, scalar_limbs,
                               ctx.g1.from_affine(P_aff),
                               c=c, scalar_bits=scalar_bits)
