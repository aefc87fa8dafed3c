"""Fused Pallas TPU kernels for the EC hot path (G1 over Fp).

The XLA lowering of the batched group law (ops/ec.py) materializes every
field-op intermediate between fusion boundaries; at MSM scale that is ~50x
off the VPU issue-rate limit. These kernels keep a whole EC operation — all
~11 Montgomery multiplications of a mixed addition — in VMEM/registers,
reading each point once and writing the result once.

Design notes (measured on TPU v5e):
* layout inside kernels is planar-transposed ("PT"): coordinates are
  (L, B) uint32 — limbs on sublanes, batch on lanes. L=24 for BLS12-381 Fp
  (16-bit digits), so a coordinate is exactly 3 sublane tiles.
* Montgomery CIOS with a full 2L+1-row accumulator held in a VMEM scratch
  ref, accumulating via slice read-modify-write (no per-iteration shift,
  single final ripple): 7.3 ns standalone, ~4.4 ns amortized inside a
  fused mixed-add (vs 12.4 ns for the shift-based kernel, 20 ns for XLA).
* the degenerate paths of the complete group law (P == Q -> doubling,
  8 extra muls) run under @pl.when(any-lane-needs-it): adversarial inputs
  stay CORRECT, random inputs don't pay. This re-expresses the reference's
  constant-time-complete law (ec_shortweierstrass_jacobian.nim:345-594) in
  the form that fits vartime bucket accumulation (the reference's own MSM
  also branches on degenerate additions, ec_multi_scalar_mul_scheduler.nim).
* stream kernels (bucket flush scan / merge) iterate sequential steps via
  the TPU grid's minor axis with carry state in scratch refs that persist
  across grid steps — the canonical Pallas accumulation pattern.

Pallas kernels cannot capture array constants, so the field constants
(p, Montgomery one) ride along as tiny (L, 128) inputs mapped to the same
block for every grid step.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = np.uint32(0xFFFF)

# Single shared CompilerParams for every kernel in the package (imported
# by pallas_field too). The raised scoped-vmem limit matters only for wide
# blocks (TB >= 2048); for the default TB=512 geometry the compiler's own
# usage stays far below either bound, so one constant is safe everywhere.
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
W = 16

# Stream-scan kernels absorb this many sorted-stream entries per grid step.
# 1 measured fastest on v5e (an unrolled 8-entry body regressed ~20%:
# three (L, TB) accumulators live across the unrolled madds exceed the
# register budget); K is still padded to a multiple of 8 so this can be
# raised without caller changes.
SCAN_STEP = 1


def _interpret() -> bool:
    # On CPU backends (tests), run kernels through the Pallas interpreter.
    import os
    if os.environ.get("CTT_PALLAS_INTERPRET"):
        return os.environ["CTT_PALLAS_INTERPRET"] == "1"
    return jax.default_backend() == "cpu"


def _inc0(v):
    """Add 1 to digit row 0 of (L, TB) digits (no scatter: Mosaic has no
    scatter-add lowering — rebuild row 0 by concatenation)."""
    return jnp.concatenate([v[0:1] + jnp.uint32(1), v[1:]], axis=0)


def _use_ks() -> bool:
    """Log-depth (Kogge-Stone) carry propagation instead of the serial
    L-step ripple. Measured on v5e: the MSM kernels are VPU-ISSUE-bound
    (grid steps / independent field ops overlap enough to hide the ripple
    latency), so KS's extra full-block ops LOSE there — default off; the
    pairing kernel (one long dependency chain, latency-bound at small
    batch) opts in via the _KF(ks=True) constructor arg. CTT_KS=1 forces
    it on everywhere (A/B tooling: scripts/bench_ks.py)."""
    import os
    return os.environ.get("CTT_KS", "0") == "1"


class _KF:
    """Kernel-side field ops on (L, B) planar-transposed uint32 blocks.

    Instances are built per pallas_call trace; `t_ref` is the shared
    (2L+1, B) VMEM scratch used by every multiplication in the kernel.
    """

    def __init__(self, L, p_limbs, m0, p_col, one_col, t_ref, ks=None):
        self.L = L
        self.p_limbs = p_limbs          # python ints (host constants)
        self.m0 = np.uint32(m0)
        self.p_col = p_col              # (L, 1) jnp, broadcasts over lanes
        self.one_col = one_col          # (L, 1) jnp
        self.t = t_ref
        self.ks = _use_ks() if ks is None else ks
        # (2^(16L) - 1 - p) per-digit complement, derived from the in-kernel
        # p column (a captured numpy constant would trip the pallas "no
        # captured consts" rule); users inject the missing +1 at digit 0.
        self._comp_p1 = MASK - p_col                  # (L, 1) jnp

    # -- log-depth carry propagation --------------------------------------

    def _shd(self, v, d):
        """Shift rows down by d (row i <- row i-d, zeros in)."""
        L = v.shape[0]
        z = jnp.zeros((d,) + v.shape[1:], v.dtype)
        return jnp.concatenate([z, v[: L - d]], axis=0)

    def norm_ks(self, v, pre_rounds: int = 0, carry_in=None):
        """Exact canonicalization of (L, TB) digits via Kogge-Stone.

        v: digits each < 2^17 * 2^(6*pre_rounds)-ish — pre_rounds multi-bit
        carry rounds bring the bound under 2^17, then one boolean
        generate/propagate prefix pass finishes. Returns (canonical digits
        (L, TB) all <= 0xFFFF, carry_out (TB,) total overflow past digit
        L-1 — for values known < 2^(16L) it is the comparison bit)."""
        L = self.L
        co = carry_in if carry_in is not None \
            else jnp.zeros(v.shape[1:], v.dtype)
        for _ in range(pre_rounds):
            c = v >> W
            co = co + c[L - 1]
            v = (v & MASK) + self._shd(c, 1)
        # boolean KS: digits now <= MASK + small  =>  g in {0, 1}
        g = v >> W
        p = (v & MASK) == MASK
        G, P = g, p.astype(jnp.uint32)
        d = 1
        while d < L:
            G = G | (P & self._shd(G, d))
            P = P & self._shd(P, d)
            d *= 2
        cin = self._shd(G, 1)
        out = (v + cin) & MASK
        co = co + G[L - 1]
        return out, co

    def _redc_tail(self, rows_arr, carry0):
        """Shared mul/sq tail: rows_arr (L+1, TB) raw accumulator rows
        (digits < 2^23), carry0 (TB,) extra carry into row 0. Returns the
        canonical Montgomery result with the conditional -p fold."""
        L = self.L
        v = rows_arr[:L] + jnp.concatenate(
            [carry0[None], jnp.zeros((L - 1,) + carry0.shape, jnp.uint32)], 0)
        # row L (hi) can only be reached through carry propagation of the
        # value itself: fold it as an explicit carry-out seed.
        out, co = self.norm_ks(v, pre_rounds=1,
                               carry_in=rows_arr[L])
        u = _inc0(out + self._comp_p1)
        out2, co2 = self.norm_ks(u, pre_rounds=0)
        take = ((co + co2) > 0)[None, :]
        return jnp.where(take, out2, out)

    # -- Montgomery multiplication (no-shift CIOS) -------------------------

    def mul(self, a, b):
        import os
        if self.L % 2 == 0 and os.environ.get("CTT_MUL2", "1") == "1":
            return self._mul2(a, b)
        return self._mul1(a, b)

    def _mul2(self, a, b):
        """CIOS processing TWO digits of `a` per round: the four per-digit
        scratch RMWs collapse into ONE (L+2)-row RMW per digit pair and the
        round count halves — measured faster than the 1-digit round (the
        kernel is VPU-issue-bound; scratch slice ld/st are issue slots)."""
        L, t = self.L, self.t
        TB = a.shape[1]
        t[:, :] = jnp.zeros((2 * L + 1, TB), jnp.uint32)
        carry = jnp.zeros((1, TB), jnp.uint32)
        z1 = jnp.zeros((1, TB), jnp.uint32)
        z2 = jnp.zeros((2, TB), jnp.uint32)
        for i in range(0, L, 2):
            A0 = a[i:i + 1, :] * b
            A1 = a[i + 1:i + 2, :] * b
            loA0 = A0 & MASK
            hiA0 = A0 >> W
            loA1 = A1 & MASK
            hiA1 = A1 >> W
            cur0 = t[i:i + 1, :] + loA0[0:1, :] + carry
            m0 = (cur0 * self.m0) & MASK
            P0 = m0 * self.p_col
            lo20 = P0 & MASK
            hi20 = P0 >> W
            c0 = (cur0 + lo20[0:1, :]) >> W
            cur1 = (t[i + 1:i + 2, :] + loA0[1:2, :] + hiA0[0:1, :]
                    + loA1[0:1, :] + lo20[1:2, :] + hi20[0:1, :] + c0)
            m1 = (cur1 * self.m0) & MASK
            P1 = m1 * self.p_col
            lo21 = P1 & MASK
            hi21 = P1 >> W
            carry = (cur1 + lo21[0:1, :]) >> W
            u0 = loA0 + lo20                       # row offset 0
            u1 = hiA0 + loA1 + hi20 + lo21         # row offset 1
            u2 = hiA1 + hi21                       # row offset 2
            t[i:i + L + 2, :] = t[i:i + L + 2, :] + (
                jnp.concatenate([u0, z2], 0)
                + jnp.concatenate([z1, u1, z1], 0)
                + jnp.concatenate([z2, u2], 0))
        if self.ks:
            return self._redc_tail(t[L:2 * L + 1, :], carry[0])
        rows = [t[L + i, :] for i in range(L)] + [t[2 * L, :]]
        rows[0] = rows[0] + carry[0]
        for i in range(L):                            # single final ripple
            c = rows[i] >> W
            rows[i] = rows[i] & MASK
            rows[i + 1] = rows[i + 1] + c
        hi_bit = rows[L]
        diff = []
        c = jnp.ones_like(rows[0])
        for i in range(L):                            # conditional -p
            s = rows[i] + (MASK - np.uint32(self.p_limbs[i])) + c
            diff.append(s & MASK)
            c = s >> W
        take = (hi_bit == 1) | (c == 1)
        return jnp.stack(
            [jnp.where(take, d, r) for d, r in zip(diff, rows[:L])], 0)

    def _mul1(self, a, b):
        L, t = self.L, self.t
        TB = a.shape[1]
        t[:, :] = jnp.zeros((2 * L + 1, TB), jnp.uint32)
        carry = jnp.zeros((1, TB), jnp.uint32)
        for i in range(L):
            prod = a[i:i + 1, :] * b                 # (L, TB) 16x16 exact
            lo = prod & MASK
            # m from the pre-update column i (no intermediate store): the
            # combined two-RMW round halves scratch load/store traffic vs
            # the four-RMW form (measured win — the flush madd is
            # issue-bound, so every slice ld/st counts).
            cur = t[i:i + 1, :] + lo[0:1, :] + carry
            m = (cur * self.m0) & MASK               # (1, TB)
            prod2 = m * self.p_col                   # (L, TB)
            lo2 = prod2 & MASK
            t[i:i + L, :] = t[i:i + L, :] + (lo + lo2)
            t[i + 1:i + L + 1, :] = \
                t[i + 1:i + L + 1, :] + ((prod >> W) + (prod2 >> W))
            # column i is exactly 0 mod 2^16 now; carry feeds column i+1
            carry = (cur + lo2[0:1, :]) >> W
        if self.ks:
            return self._redc_tail(t[L:2 * L + 1, :], carry[0])
        rows = [t[L + i, :] for i in range(L)] + [t[2 * L, :]]
        rows[0] = rows[0] + carry[0]
        for i in range(L):                            # single final ripple
            c = rows[i] >> W
            rows[i] = rows[i] & MASK
            rows[i + 1] = rows[i + 1] + c
        hi_bit = rows[L]
        diff = []
        c = jnp.ones_like(rows[0])
        for i in range(L):                            # conditional -p
            s = rows[i] + (MASK - np.uint32(self.p_limbs[i])) + c
            diff.append(s & MASK)
            c = s >> W
        take = (hi_bit == 1) | (c == 1)
        return jnp.stack(
            [jnp.where(take, d, r) for d, r in zip(diff, rows[:L])], 0)

    def sq(self, a):
        """Dedicated Montgomery squaring: upper-triangle products only
        (off-diagonals doubled after the lo/hi split, so no u32 overflow),
        reduction interleaved as in mul. Column i has received every
        square contribution (a_j·a_{i-j}, j <= i/2) by step i, so the
        interleaved no-shift reduction stays valid. ~20% fewer vector ops
        than mul (product phase halves, reduction unchanged) — the
        finite_fields.nim square/mul distinction, re-derived for rows."""
        L, t = self.L, self.t
        TB = a.shape[1]
        t[:, :] = jnp.zeros((2 * L + 1, TB), jnp.uint32)
        carry = jnp.zeros((1, TB), jnp.uint32)
        one = np.uint32(1)
        z1 = jnp.zeros((1, a.shape[1]), jnp.uint32)
        for i in range(L):
            prod = a[i:i + 1, :] * a[i:, :]          # rows j=i..L-1
            lo = prod & MASK
            hi = prod >> W
            if L - i > 1:                            # double off-diagonals
                lo = jnp.concatenate([lo[0:1], lo[1:] << one], 0)
                hi = jnp.concatenate([hi[0:1], hi[1:] << one], 0)
            # single fused product RMW on rows 2i..i+L
            t[2 * i:i + L + 1, :] = t[2 * i:i + L + 1, :] + (
                jnp.concatenate([lo, z1], 0) + jnp.concatenate([z1, hi], 0))
            cur = t[i:i + 1, :] + carry
            m = (cur * self.m0) & MASK               # (1, TB)
            prod2 = m * self.p_col                   # (L, TB)
            lo2 = prod2 & MASK
            # single fused reduction RMW on rows i..i+L
            t[i:i + L + 1, :] = t[i:i + L + 1, :] + (
                jnp.concatenate([lo2, z1], 0)
                + jnp.concatenate([z1, prod2 >> W], 0))
            carry = (cur + lo2[0:1, :]) >> W
        if self.ks:
            return self._redc_tail(t[L:2 * L + 1, :], carry[0])
        rows = [t[L + i, :] for i in range(L)] + [t[2 * L, :]]
        rows[0] = rows[0] + carry[0]
        for i in range(L):                            # single final ripple
            c = rows[i] >> W
            rows[i] = rows[i] & MASK
            rows[i + 1] = rows[i + 1] + c
        hi_bit = rows[L]
        diff = []
        c = jnp.ones_like(rows[0])
        for i in range(L):                            # conditional -p
            s = rows[i] + (MASK - np.uint32(self.p_limbs[i])) + c
            diff.append(s & MASK)
            c = s >> W
        take = (hi_bit == 1) | (c == 1)
        return jnp.stack(
            [jnp.where(take, d, r) for d, r in zip(diff, rows[:L])], 0)

    # -- add/sub with ripple + conditional correction ----------------------

    def add(self, a, b):
        L = self.L
        s = a + b
        if self.ks:
            # both normalization passes are independent -> their dependent
            # KS levels interleave in the VPU pipeline
            out1, _ = self.norm_ks(s, 0)              # a + b < 2p < 2^16L
            u = _inc0(s + self._comp_p1)
            out2, co2 = self.norm_ks(u, 1)
            return jnp.where((co2 > 0)[None, :], out2, out1)
        out = []
        c = jnp.zeros((a.shape[1],), jnp.uint32)
        for i in range(L):
            v = s[i, :] + c
            out.append(v & MASK)
            c = v >> W
        d = []
        bc = jnp.ones_like(c)
        for i in range(L):
            v = out[i] + (MASK - np.uint32(self.p_limbs[i])) + bc
            d.append(v & MASK)
            bc = v >> W
        take = (c == 1) | (bc == 1)
        return jnp.stack(
            [jnp.where(take, x, y) for x, y in zip(d, out)], 0)

    def sub(self, a, b):
        L = self.L
        if self.ks:
            u = _inc0(a + (MASK - b))                  # a - b + 2^16L
            out1, co1 = self.norm_ks(u, 0)            # co1 > 0  <=>  a >= b
            out2, _ = self.norm_ks(u + self.p_col, 1)  # (a - b + p) branch
            return jnp.where((co1 == 0)[None, :], out2, out1)
        out = []
        c = jnp.ones((a.shape[1],), jnp.uint32)
        for i in range(L):
            v = a[i, :] + (MASK - b[i, :]) + c
            out.append(v & MASK)
            c = v >> W
        borrow = c == 0
        d = []
        cc = jnp.zeros_like(c)
        for i in range(L):
            v = out[i] + np.uint32(self.p_limbs[i]) + cc
            d.append(v & MASK)
            cc = v >> W
        return jnp.stack(
            [jnp.where(borrow, x, y) for x, y in zip(d, out)], 0)

    def dbl(self, a):
        return self.add(a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def sel(self, cond, a, b):
        return jnp.where(cond[None, :], a, b)

    def one(self, TB):
        return jnp.broadcast_to(self.one_col, (self.L, TB))

    def zero(self, TB):
        return jnp.zeros((self.L, TB), jnp.uint32)

    # -- group law bodies (a = 0 short Weierstrass, Jacobian) --------------

    def ec_double(self, X, Y, Z):
        """dbl-2009-l (a=0). Z=0 in -> Z3=0 out; Y=0 -> infinity."""
        A = self.sq(X)
        B = self.sq(Y)
        C = self.sq(B)
        t = self.sq(self.add(X, B))
        D = self.dbl(self.sub(self.sub(t, A), C))
        E = self.add(self.dbl(A), A)
        Fq = self.sq(E)
        X3 = self.sub(Fq, self.dbl(D))
        Y3 = self.sub(self.mul(E, self.sub(D, X3)),
                      self.dbl(self.dbl(self.dbl(C))))
        Z3 = self.dbl(self.mul(Y, Z))
        return X3, Y3, Z3

    def ec_madd(self, X1, Y1, Z1, X2, Y2, dbl_scratch):
        """Complete mixed add: Jacobian (X1,Y1,Z1) + affine (X2,Y2).

        madd-2007-bl core; degenerate doubling path under @pl.when into
        `dbl_scratch` (a (3, L, TB) VMEM ref). Affine infinity is NOT
        handled here (callers guarantee real points; MSM key-0 entries are
        dropped downstream).
        """
        TB = X1.shape[1]
        Z1Z1 = self.sq(Z1)
        U2 = self.mul(X2, Z1Z1)
        S2 = self.mul(self.mul(Y2, Z1), Z1Z1)
        H = self.sub(U2, X1)
        HH = self.sq(H)
        I = self.dbl(self.dbl(HH))
        J = self.mul(H, I)
        R = self.dbl(self.sub(S2, Y1))
        V = self.mul(X1, I)
        X3 = self.sub(self.sub(self.sq(R), J), self.dbl(V))
        Y3 = self.sub(self.mul(R, self.sub(V, X3)),
                      self.dbl(self.mul(Y1, J)))
        Z3 = self.sub(self.sub(self.sq(self.add(Z1, H)), Z1Z1), HH)

        p_inf = self.is_zero(Z1)
        h0 = self.is_zero(H)
        r0 = self.is_zero(R)
        is_dbl = (~p_inf) & h0 & r0
        is_opp = (~p_inf) & h0 & (~r0)

        @pl.when(jnp.any(is_dbl))
        def _():
            Xd, Yd, Zd = self.ec_double(X1, Y1, Z1)
            dbl_scratch[0] = Xd
            dbl_scratch[1] = Yd
            dbl_scratch[2] = Zd

        one = self.one(TB)
        zero = self.zero(TB)
        X3 = self.sel(is_dbl, dbl_scratch[0], X3)
        Y3 = self.sel(is_dbl, dbl_scratch[1], Y3)
        Z3 = self.sel(is_dbl, dbl_scratch[2], Z3)
        X3 = self.sel(is_opp, one, X3)
        Y3 = self.sel(is_opp, one, Y3)
        Z3 = self.sel(is_opp, zero, Z3)
        X3 = self.sel(p_inf, X2, X3)
        Y3 = self.sel(p_inf, Y2, Y3)
        Z3 = self.sel(p_inf, one, Z3)
        return X3, Y3, Z3

    def ec_add(self, X1, Y1, Z1, X2, Y2, Z2, dbl_scratch):
        """Complete Jacobian + Jacobian add (add-2007-bl core)."""
        TB = X1.shape[1]
        Z1Z1 = self.sq(Z1)
        Z2Z2 = self.sq(Z2)
        U1 = self.mul(X1, Z2Z2)
        U2 = self.mul(X2, Z1Z1)
        S1 = self.mul(self.mul(Y1, Z2), Z2Z2)
        S2 = self.mul(self.mul(Y2, Z1), Z1Z1)
        H = self.sub(U2, U1)
        R = self.dbl(self.sub(S2, S1))
        I = self.sq(self.dbl(H))
        J = self.mul(H, I)
        V = self.mul(U1, I)
        X3 = self.sub(self.sub(self.sq(R), J), self.dbl(V))
        Y3 = self.sub(self.mul(R, self.sub(V, X3)),
                      self.dbl(self.mul(S1, J)))
        Z3 = self.mul(
            self.sub(self.sub(self.sq(self.add(Z1, Z2)), Z1Z1), Z2Z2), H)

        p_inf = self.is_zero(Z1)
        q_inf = self.is_zero(Z2)
        h0 = self.is_zero(H)
        r0 = self.is_zero(R)
        both = (~p_inf) & (~q_inf)
        is_dbl = both & h0 & r0
        is_opp = both & h0 & (~r0)

        @pl.when(jnp.any(is_dbl))
        def _():
            Xd, Yd, Zd = self.ec_double(X1, Y1, Z1)
            dbl_scratch[0] = Xd
            dbl_scratch[1] = Yd
            dbl_scratch[2] = Zd

        one = self.one(TB)
        zero = self.zero(TB)
        X3 = self.sel(is_dbl, dbl_scratch[0], X3)
        Y3 = self.sel(is_dbl, dbl_scratch[1], Y3)
        Z3 = self.sel(is_dbl, dbl_scratch[2], Z3)
        X3 = self.sel(is_opp, one, X3)
        Y3 = self.sel(is_opp, one, Y3)
        Z3 = self.sel(is_opp, zero, Z3)
        X3 = self.sel(p_inf, X2, X3)
        Y3 = self.sel(p_inf, Y2, Y3)
        Z3 = self.sel(p_inf, Z2, Z3)
        X3 = self.sel(q_inf, X1, X3)
        Y3 = self.sel(q_inf, Y1, Y3)
        Z3 = self.sel(q_inf, Z1, Z3)
        return X3, Y3, Z3


class PallasEC:
    """Fused-kernel EC ops for a short-Weierstrass a=0 group over Fp.

    Public methods operate on planar-transposed coordinates: uint32 arrays
    of shape (L, N) with N a multiple of `block` (pad with infinity/zeros).
    """

    def __init__(self, field, block: int = 512):
        assert field.bits <= 16 * field.L
        self.F = field
        self.L = field.L
        self.block = block
        self._p_limbs = tuple(int(v) for v in field.p)
        self._m0 = np.uint32(field.m0ninv)
        consts = np.zeros((2, self.L, 128), np.uint32)
        consts[0] = np.asarray(field.p, np.uint32)[:, None]
        consts[1] = np.asarray(field.one, np.uint32)[:, None]
        self._consts = consts  # numpy: safe to reuse across jit traces
        self._cache = {}

    # -- kernel plumbing ----------------------------------------------------

    def _kf(self, c_ref, t_ref):
        return _KF(self.L, self._p_limbs, self._m0,
                   c_ref[0, :, :1], c_ref[1, :, :1], t_ref)

    def _elemwise(self, name, n_in, n_out, body, n, TB=None):
        """Build/call an elementwise point kernel over (L, n) coords."""
        TB = TB or self.block
        L = self.L
        key = (name, n, TB)
        if key not in self._cache:
            def kern(*refs):
                ins = refs[:n_in]
                c_ref = refs[n_in]
                outs = refs[n_in + 1:n_in + 1 + n_out]
                t_ref = refs[-2]
                dbl_ref = refs[-1]
                kf = self._kf(c_ref, t_ref)
                res = body(kf, [r[:, :] for r in ins], dbl_ref)
                for o, v in zip(outs, res):
                    o[:, :] = v

            grid = (n // TB,)
            fn = pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[pl.BlockSpec((L, TB), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)] * n_in
                + [pl.BlockSpec((2, L, 128), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
                out_specs=[pl.BlockSpec((L, TB), lambda i: (0, i),
                                        memory_space=pltpu.VMEM)] * n_out,
                out_shape=[jax.ShapeDtypeStruct((L, n), jnp.uint32)] * n_out,
                scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32),
                                pltpu.VMEM((3, L, TB), jnp.uint32)],
                interpret=_interpret(),
                compiler_params=_CPARAMS,
            )
            self._cache[key] = jax.jit(fn)
        return self._cache[key]

    def _pad(self, arrs, n):
        npad = -n % self.block
        if npad == 0:
            return arrs, n
        out = [jnp.pad(a, ((0, 0), (0, npad))) for a in arrs]
        return out, n + npad

    # -- public fused ops ----------------------------------------------------

    def madd(self, P, Q):
        """(X,Y,Z) + affine (x,y), all (L, N). Returns (X3,Y3,Z3)."""
        n0 = P[0].shape[1]
        ins, n = self._pad(list(P) + list(Q), n0)
        f = self._elemwise(
            "madd", 5, 3,
            lambda kf, a, d: kf.ec_madd(a[0], a[1], a[2], a[3], a[4], d), n)
        out = f(*ins, self._consts)
        return tuple(o[:, :n0] for o in out)

    def add(self, P, Q):
        n0 = P[0].shape[1]
        ins, n = self._pad(list(P) + list(Q), n0)
        f = self._elemwise(
            "add", 6, 3,
            lambda kf, a, d: kf.ec_add(a[0], a[1], a[2], a[3], a[4], a[5], d),
            n)
        out = f(*ins, self._consts)
        return tuple(o[:, :n0] for o in out)

    def double(self, P):
        n0 = P[0].shape[1]
        ins, n = self._pad(list(P), n0)
        f = self._elemwise(
            "double", 3, 3,
            lambda kf, a, d: kf.ec_double(a[0], a[1], a[2]), n)
        out = f(*ins, self._consts)
        return tuple(o[:, :n0] for o in out)

    def double_k(self, P, k: int):
        """k fused doublings (window combine)."""
        n0 = P[0].shape[1]
        ins, n = self._pad(list(P), n0)

        def body(kf, a, d):
            X, Y, Z = a
            for _ in range(k):
                X, Y, Z = kf.ec_double(X, Y, Z)
            return X, Y, Z

        f = self._elemwise(f"double{k}", 3, 3, body, n)
        out = f(*ins, self._consts)
        return tuple(o[:, :n0] for o in out)

    # -- stream kernels -------------------------------------------------------

    def flush_scan(self, keys, qx, qy, TB: int = None, packed: bool = False):
        """Bucket-accumulation flush scan over a key-sorted stream.

        keys: (K, M) int32 — lane m sweeps keys[:, m] sequentially; K must
        be a multiple of 8 (the kernel absorbs 8 stream entries per grid
        step via an (8, L, TB) block, so every per-entry read/write is a
        full aligned (L, TB) tile and per-step grid overhead is amortized).
        With packed=True, qx is a single fused stream (K, L, M) whose rows
        0..L/2-1 are the packed x digits (two 16-bit digits per u32, digit
        2i in the low half of row i) and rows L/2..L-1 the packed y digits
        (pre-negated); qy is ignored (pass None). The kernel unpacks in
        VMEM, halving the HBM read traffic of the dominant input stream,
        and the caller needs only ONE wide gather for all point data.
        With packed=False, qx/qy are (K, L, M) unpacked x and y streams.

        Returns (ex, ey, ez) (K, L, M): slot (k, m) holds lane m's
        accumulator AFTER absorbing stream entry k. The last slot of each
        key-run therefore holds the full lane-local run sum, and run
        boundaries are recoverable from the sorted input keys alone (key
        change within the lane, or k == K-1) — the kernel emits no key or
        final planes; the caller compacts with masks/positions it computes
        itself (msm_tpu._compact_from_sorted / _compact_mask_gather).

        TPU-native replacement for the reference's CycloneMSM scheduler
        (ec_multi_scalar_mul_scheduler.nim:301-618): collision freedom
        comes from the sort, partial sums merge downstream.

        CTT_MSM_PAIR=k interleaves k INDEPENDENT lane half-blocks per
        body invocation. Bare Montgomery-mul chains measure 1.7x per-lane
        throughput at k=2 (scripts/bench_ilp.py: the chains are
        latency-bound at ~30 cycles per dependent vector op), but the
        FULL madd at k=2 measured SLOWER (85ms vs 66ms at N=2^16 GLV) —
        two madds' live state spills — so the default stays 1; the knob
        is kept for narrower-state kernels and future retuning.
        """
        import os
        ST = SCAN_STEP                                # entries per grid step
        K, M0 = keys.shape
        assert K % ST == 0, (K, ST)
        M = M0
        L = self.L
        Lh = L // 2
        n_in = 2 if not packed else 1
        assert qx.shape[1] == L, (qx.shape, L)
        TB = TB or self.block
        pair = int(os.environ.get("CTT_MSM_PAIR", "1"))
        TBW = TB * pair                               # block width
        npad = -M % TBW
        if npad:
            keys = jnp.pad(keys, ((0, 0), (0, npad)), constant_values=-1)
            qx = jnp.pad(qx, ((0, 0), (0, 0), (0, npad)))
            if qy is not None:
                qy = jnp.pad(qy, ((0, 0), (0, 0), (0, npad)))
            M += npad
        keys = keys[:, None, :]                      # (K, 1, M) for tiling

        def unpack(v):
            # (L//2, TB) packed -> (L, TB) 16-bit digit rows
            rows = []
            for i in range(v.shape[0]):
                rows.append(v[i:i + 1, :] & MASK)
                rows.append(v[i:i + 1, :] >> W)
            return jnp.concatenate(rows, axis=0)

        ckey = ("flush", K, M, TB, packed, pair)
        if ckey not in self._cache:
            def kern(*refs):
                if packed:
                    (k_ref, xy_ref, c_ref, ex_ref, ey_ref, ez_ref) = \
                        refs[:6]
                    scr = refs[6:]
                else:
                    (k_ref, x_ref, y_ref, c_ref, ex_ref, ey_ref,
                     ez_ref) = refs[:7]
                    scr = refs[7:]
                t_refs = scr[0:pair]
                dbl_refs = scr[pair:2 * pair]
                acc_refs = scr[2 * pair:3 * pair]
                key_ref = scr[3 * pair]
                k8 = pl.program_id(1)
                kfs = [self._kf(refs[3] if not packed else refs[2], t)
                       for t in t_refs]

                @pl.when(k8 == 0)
                def _():
                    for h in range(pair):
                        acc_refs[h][0] = kfs[h].one(TB)
                        acc_refs[h][1] = kfs[h].one(TB)
                        acc_refs[h][2] = kfs[h].zero(TB)
                    key_ref[:, :] = jnp.full((8, TBW), -1, jnp.int32)

                for j in range(ST):
                    # `pair` independent half-block madds, interleaved by
                    # the Mosaic scheduler (separate scratch per half)
                    for h in range(pair):
                        kf = kfs[h]
                        sl = slice(h * TB, (h + 1) * TB)
                        kk = k_ref[j, 0, sl]
                        if packed:
                            X2 = unpack(xy_ref[j, :Lh, sl])
                            Y2 = unpack(xy_ref[j, Lh:, sl])
                        else:
                            X2 = x_ref[j, :, sl]
                            Y2 = y_ref[j, :, sl]
                        aX = acc_refs[h][0]
                        aY = acc_refs[h][1]
                        aZ = acc_refs[h][2]
                        cur = key_ref[0, sl]
                        same = kk == cur
                        # grown = acc + Q ; fresh = Q (new run)
                        gX, gY, gZ = kf.ec_madd(aX, aY, aZ, X2, Y2,
                                                dbl_refs[h])
                        one = kf.one(TB)
                        aX = kf.sel(same, gX, X2)
                        aY = kf.sel(same, gY, Y2)
                        aZ = kf.sel(same, gZ, one)
                        ex_ref[j, :, sl] = aX
                        ey_ref[j, :, sl] = aY
                        ez_ref[j, :, sl] = aZ
                        acc_refs[h][0] = aX
                        acc_refs[h][1] = aY
                        acc_refs[h][2] = aZ
                        key_ref[0, sl] = kk

            grid = (M // TBW, K // ST)
            kspec = pl.BlockSpec((ST, 1, TBW), lambda m, k: (k, 0, m),
                                 memory_space=pltpu.VMEM)
            inspec = pl.BlockSpec((ST, L, TBW), lambda m, k: (k, 0, m),
                                  memory_space=pltpu.VMEM)
            fn = pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[kspec] + [inspec] * n_in
                + [pl.BlockSpec((2, L, 128), lambda m, k: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
                out_specs=[inspec, inspec, inspec],
                out_shape=[jax.ShapeDtypeStruct((K, L, M), jnp.uint32)] * 3,
                scratch_shapes=(
                    [pltpu.VMEM((2 * L + 1, TB), jnp.uint32)] * pair
                    + [pltpu.VMEM((3, L, TB), jnp.uint32)] * pair
                    + [pltpu.VMEM((3, L, TB), jnp.uint32)] * pair
                    + [pltpu.VMEM((8, TBW), jnp.int32)]),
                interpret=_interpret(),
                compiler_params=_CPARAMS,
            )
            self._cache[ckey] = jax.jit(fn)
        ins = (keys, qx) if packed else (keys, qx, qy)
        ex, ey, ez = self._cache[ckey](*ins, self._consts)
        return ex[:, :, :M0], ey[:, :, :M0], ez[:, :, :M0]

    def merge_scan(self, keys, qx, qy, qz, TB: int = None):
        """Like flush_scan but the stream entries are Jacobian partial sums
        (merging pass over compacted flush emissions). keys (K, M) with
        K % 8 == 0; qx, qy, qz (K, L, M). Entries with key <= 0 are
        neutral padding. Returns (ex, ey, ez) (K, L, M) post-step
        accumulators (same emission contract as flush_scan: last slot of
        each run = run sum)."""
        ST = SCAN_STEP
        K, M0 = keys.shape
        assert K % ST == 0, (K, ST)
        M = M0
        L = self.L
        TB = TB or self.block
        npad = -M % TB
        if npad:
            keys = jnp.pad(keys, ((0, 0), (0, npad)), constant_values=-1)
            qx = jnp.pad(qx, ((0, 0), (0, 0), (0, npad)))
            qy = jnp.pad(qy, ((0, 0), (0, 0), (0, npad)))
            qz = jnp.pad(qz, ((0, 0), (0, 0), (0, npad)))
            M += npad
        keys = keys[:, None, :]                      # (K, 1, M) for tiling

        ckey = ("merge", K, M, TB)
        if ckey not in self._cache:
            def kern(k_ref, x_ref, y_ref, z_ref, c_ref,
                     ex_ref, ey_ref, ez_ref,
                     t_ref, dbl_ref, acc_ref, key_ref):
                k8 = pl.program_id(1)
                kf = self._kf(c_ref, t_ref)

                @pl.when(k8 == 0)
                def _():
                    acc_ref[0] = kf.one(TB)
                    acc_ref[1] = kf.one(TB)
                    acc_ref[2] = kf.zero(TB)
                    key_ref[:, :] = jnp.full((8, TB), -1, jnp.int32)

                aX, aY, aZ = acc_ref[0], acc_ref[1], acc_ref[2]
                cur = key_ref[0, :]
                for j in range(ST):
                    kk = k_ref[j, 0, :]
                    X2, Y2, Z2 = x_ref[j], y_ref[j], z_ref[j]
                    # neutralize padding entries (key <= 0)
                    padm = kk <= 0
                    Z2 = kf.sel(padm, kf.zero(TB), Z2)
                    same = kk == cur
                    gX, gY, gZ = kf.ec_add(aX, aY, aZ, X2, Y2, Z2, dbl_ref)
                    aX = kf.sel(same, gX, X2)
                    aY = kf.sel(same, gY, Y2)
                    aZ = kf.sel(same, gZ, Z2)
                    cur = kk
                    ex_ref[j] = aX
                    ey_ref[j] = aY
                    ez_ref[j] = aZ
                acc_ref[0], acc_ref[1], acc_ref[2] = aX, aY, aZ
                key_ref[0, :] = cur

            grid = (M // TB, K // ST)
            kspec = pl.BlockSpec((ST, 1, TB), lambda m, k: (k, 0, m),
                                 memory_space=pltpu.VMEM)
            pspec = pl.BlockSpec((ST, L, TB), lambda m, k: (k, 0, m),
                                 memory_space=pltpu.VMEM)
            fn = pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[kspec, pspec, pspec, pspec,
                          pl.BlockSpec((2, L, 128), lambda m, k: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[pspec, pspec, pspec],
                out_shape=[jax.ShapeDtypeStruct((K, L, M), jnp.uint32)] * 3,
                scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32),
                                pltpu.VMEM((3, L, TB), jnp.uint32),
                                pltpu.VMEM((3, L, TB), jnp.uint32),
                                pltpu.VMEM((8, TB), jnp.int32)],
                interpret=_interpret(),
                compiler_params=_CPARAMS,
            )
            self._cache[ckey] = jax.jit(fn)
        ex, ey, ez = self._cache[ckey](keys, qx, qy, qz, self._consts)
        return ex[:, :, :M0], ey[:, :, :M0], ez[:, :, :M0]

    def bucket_reduce(self, bx, by, bz, T: int):
        """Weighted bucket reduction: inputs are bucket sums laid out as
        (T, L, C) — T serial steps (minor bucket index, DESCENDING weight
        within a chunk as step increases... see msm_tpu for the layout).

        For each lane c (a chunk of T consecutive buckets), computes
          run_c  = sum_t B[t, c]
          wsum_c = sum_t (T-1-t)·B[t, c]        (local weights, top-down)
        via the classic running-suffix trick (2 adds per step). Returns
        (run, wsum) as (L, C) planar coords each (Jacobian).

        The caller combines chunks: sum_b (b+1)·B_b per window
        = sum_c [ (c·T)·run_c + wsum_c + run_c ].
        """
        Tn, L, C = bx.shape
        assert Tn == T and L == self.L
        TB = min(self.block, max(128, C))
        npad = -C % TB
        if npad:
            bx = jnp.pad(bx, ((0, 0), (0, 0), (0, npad)))
            by = jnp.pad(by, ((0, 0), (0, 0), (0, npad)))
            bz = jnp.pad(bz, ((0, 0), (0, 0), (0, npad)))
            C += npad

        ckey = ("bred", T, C, TB)
        if ckey not in self._cache:
            def kern(x_ref, y_ref, z_ref, c_ref,
                     rx_ref, ry_ref, rz_ref, wx_ref, wy_ref, wz_ref,
                     t_ref, dbl_ref, run_ref, wsum_ref):
                t = pl.program_id(1)
                kf = self._kf(c_ref, t_ref)

                @pl.when(t == 0)
                def _():
                    run_ref[0] = kf.one(TB)
                    run_ref[1] = kf.one(TB)
                    run_ref[2] = kf.zero(TB)
                    wsum_ref[0] = kf.one(TB)
                    wsum_ref[1] = kf.one(TB)
                    wsum_ref[2] = kf.zero(TB)

                X, Y, Z = x_ref[0], y_ref[0], z_ref[0]
                # wsum += run BEFORE absorbing this step's bucket: bucket at
                # step t then accumulates into wsum (T-1-t) times total.
                wX, wY, wZ = kf.ec_add(wsum_ref[0], wsum_ref[1], wsum_ref[2],
                                       run_ref[0], run_ref[1], run_ref[2],
                                       dbl_ref)
                wsum_ref[0], wsum_ref[1], wsum_ref[2] = wX, wY, wZ
                rX, rY, rZ = kf.ec_add(run_ref[0], run_ref[1], run_ref[2],
                                       X, Y, Z, dbl_ref)
                run_ref[0], run_ref[1], run_ref[2] = rX, rY, rZ
                rx_ref[0] = run_ref[0]
                ry_ref[0] = run_ref[1]
                rz_ref[0] = run_ref[2]
                wx_ref[0] = wsum_ref[0]
                wy_ref[0] = wsum_ref[1]
                wz_ref[0] = wsum_ref[2]

            grid = (C // TB, T)
            pspec = pl.BlockSpec((1, L, TB), lambda c, t: (t, 0, c),
                                 memory_space=pltpu.VMEM)
            ospec = pl.BlockSpec((1, L, TB), lambda c, t: (0, 0, c),
                                 memory_space=pltpu.VMEM)
            fn = pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[pspec, pspec, pspec,
                          pl.BlockSpec((2, L, 128), lambda c, t: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[ospec] * 6,
                out_shape=[jax.ShapeDtypeStruct((1, L, C), jnp.uint32)] * 6,
                scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32),
                                pltpu.VMEM((3, L, TB), jnp.uint32),
                                pltpu.VMEM((3, L, TB), jnp.uint32),
                                pltpu.VMEM((3, L, TB), jnp.uint32)],
                interpret=_interpret(),
                compiler_params=_CPARAMS,
            )
            self._cache[ckey] = jax.jit(fn)
        rx, ry, rz, wx, wy, wz = self._cache[ckey](bx, by, bz, self._consts)
        sl = slice(0, C - npad if npad else C)
        return ((rx[0][:, sl], ry[0][:, sl], rz[0][:, sl]),
                (wx[0][:, sl], wy[0][:, sl], wz[0][:, sl]))

    def scaled_doubles(self, P, c: int, Wn: int):
        """Lane-indexed doubling ladder: lane w of the (L, Wn) input becomes
        2^(c*w) * P_w, via (Wn-1)*c serial in-kernel doubling steps, each
        masked to the lanes still owing doublings (t < c*w). One kernel
        launch replaces the per-window double_k/add chain of the MSM window
        combine (the serial loop of ec_multi_scalar_mul.nim:350's final
        combine), leaving only a log2(Wn) add-tree to the caller."""
        X, Y, Z = P
        Wn0 = X.shape[1]
        assert Wn0 == Wn
        steps = (Wn - 1) * c
        if steps == 0:
            return P
        L = self.L
        TB = max(128, -(-Wn // 128) * 128)
        npad = TB - Wn
        if npad:
            X = jnp.pad(X, ((0, 0), (0, npad)))
            Y = jnp.pad(Y, ((0, 0), (0, npad)))
            Z = jnp.pad(Z, ((0, 0), (0, npad)))

        ckey = ("scdbl", c, Wn, TB)
        if ckey not in self._cache:
            def kern(x_ref, y_ref, z_ref, c_ref, ox_ref, oy_ref, oz_ref,
                     t_ref, st_ref):
                t = pl.program_id(0)
                kf = self._kf(c_ref, t_ref)

                @pl.when(t == 0)
                def _():
                    st_ref[0] = x_ref[:, :]
                    st_ref[1] = y_ref[:, :]
                    st_ref[2] = z_ref[:, :]

                lane = jax.lax.broadcasted_iota(jnp.int32, (1, TB), 1)[0]
                live = t < lane * c
                Xd, Yd, Zd = kf.ec_double(st_ref[0], st_ref[1], st_ref[2])
                st_ref[0] = kf.sel(live, Xd, st_ref[0])
                st_ref[1] = kf.sel(live, Yd, st_ref[1])
                st_ref[2] = kf.sel(live, Zd, st_ref[2])
                ox_ref[:, :] = st_ref[0]
                oy_ref[:, :] = st_ref[1]
                oz_ref[:, :] = st_ref[2]

            spec = pl.BlockSpec((L, TB), lambda t: (0, 0),
                                memory_space=pltpu.VMEM)
            fn = pl.pallas_call(
                kern,
                grid=(steps,),
                in_specs=[spec, spec, spec,
                          pl.BlockSpec((2, L, 128), lambda t: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[spec] * 3,
                out_shape=[jax.ShapeDtypeStruct((L, TB), jnp.uint32)] * 3,
                scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32),
                                pltpu.VMEM((3, L, TB), jnp.uint32)],
                interpret=_interpret(),
                compiler_params=_CPARAMS,
            )
            self._cache[ckey] = jax.jit(fn)
        ox, oy, oz = self._cache[ckey](X, Y, Z, self._consts)
        return ox[:, :Wn], oy[:, :Wn], oz[:, :Wn]


class PallasAffine:
    """Packed batched-inversion kernels — the TPU re-expression of the
    reference's Montgomery-trick batchAffine machinery
    (ec_shortweierstrass_batch_ops.nim:29-187).

    Field elements ride PACKED (two 16-bit digits per u32): a coordinate
    is L/2 rows. `batch_inv_packed` chains products along the grid minor
    axis (chain_fwd), inverts one packed product per big chunk with a
    Fermat pow kernel (fermat_inv), and unwinds (chain_bwd_inv) — one
    modular inversion amortized over C*chunk elements.

    History: these kernels originally backed an affine pair-merge MSM
    bucket-accumulation path (the reference's production msmAffineImpl
    strategy). That path measured SLOWER than the Jacobian flush scan on
    this hardware (the flush is latency-bound, not op-count-bound) and
    was removed in round 4; the inversion kernels stay as the batch-affine
    component used for mass Jacobian->affine conversion.
    """

    def __init__(self, pec: "PallasEC"):
        self.pec = pec
        self.L = pec.L
        self.Lh = pec.L // 2
        self.block = pec.block
        self._cache = {}
        # exponent bits of p-2 (MSB first) for Fermat inversion
        F = pec.F
        p_int = 0
        for i, v in enumerate(pec._p_limbs):
            p_int |= int(v) << (16 * i)
        e = p_int - 2
        bits = [int(b) for b in bin(e)[2:]]
        nb = len(bits)
        arr = np.zeros((1, _rup128(nb)), np.int32)
        arr[0, :nb] = bits
        self._fermat_bits = arr
        self._nbits = nb

    # -- packing helpers (kernel-side) --------------------------------------

    def _unpack(self, v):
        rows = []
        for i in range(v.shape[0]):
            rows.append(v[i:i + 1, :] & MASK)
            rows.append(v[i:i + 1, :] >> W)
        return jnp.concatenate(rows, axis=0)

    def _pack(self, v):
        # strided sublane slices don't lower on Mosaic; use static row pairs
        L = v.shape[0]
        rows = [v[i:i + 1, :] | (v[i + 1:i + 2, :] << W)
                for i in range(0, L, 2)]
        return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)

    # -- chain kernels (Montgomery batch inversion) --------------------------

    def chain_fwd(self, dC):
        """dC: (C, Lh, Mw) packed denominators; chain along axis 0.
        Returns (prefix_ex (C, Lh, Mw) — product of d[0..c-1], packed —
        and block products (Lh, Mw))."""
        C, Lh, Mw = dC.shape
        L, TB = self.L, self.block
        assert Lh == self.Lh and Mw % TB == 0
        ck = ("cfwd", C, Mw)
        if ck not in self._cache:
            def kern(d_ref, c_ref, pe_ref, bp_ref, t_ref, run_ref):
                c = pl.program_id(1)
                kf = self.pec._kf(c_ref, t_ref)

                @pl.when(c == 0)
                def _():
                    run_ref[:, :] = kf.one(TB)

                pe_ref[0] = self._pack(run_ref[:, :])
                d = self._unpack(d_ref[0])
                run_ref[:, :] = kf.mul(run_ref[:, :], d)
                bp_ref[0] = self._pack(run_ref[:, :])

            grid = (Mw // TB, C)
            dspec = pl.BlockSpec((1, Lh, TB), lambda m, c: (c, 0, m),
                                 memory_space=pltpu.VMEM)
            bspec = pl.BlockSpec((1, Lh, TB), lambda m, c: (0, 0, m),
                                 memory_space=pltpu.VMEM)
            fn = pl.pallas_call(
                kern, grid=grid,
                in_specs=[dspec,
                          pl.BlockSpec((2, L, 128), lambda m, c: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[dspec, bspec],
                out_shape=[jax.ShapeDtypeStruct((C, Lh, Mw), jnp.uint32),
                           jax.ShapeDtypeStruct((1, Lh, Mw), jnp.uint32)],
                scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32),
                                pltpu.VMEM((L, TB), jnp.uint32)],
                interpret=_interpret(),
                compiler_params=_CPARAMS,
            )
            self._cache[ck] = jax.jit(fn)
        pe, bp = self._cache[ck](dC, self.pec._consts)
        return pe, bp[0]

    def fermat_inv(self, xpack):
        """(Lh, Wd) packed -> (Lh, Wd) packed inverse via x^(p-2).
        Wd must be <= a few blocks; cost ~2*nbits muls."""
        Lh, Wd0 = xpack.shape
        L = self.L
        TB = min(self.block, max(128, _rup128(Wd0)))
        Wd = _rupn(Wd0, TB)
        if Wd != Wd0:
            one_packed = np.asarray(
                self.pec._consts[1, :, 0], np.uint32)
            onep = (one_packed[0::2] | (one_packed[1::2] << 16))
            pad = jnp.broadcast_to(jnp.asarray(onep)[:, None],
                                   (Lh, Wd - Wd0))
            xpack = jnp.concatenate([xpack, pad], axis=1)
        nb = self._nbits
        ck = ("fermat", Wd, TB)
        if ck not in self._cache:
            def kern(x_ref, bits_ref, c_ref, o_ref, t_ref):
                kf = self.pec._kf(c_ref, t_ref)
                base = self._unpack(x_ref[:, :])

                def body(i, acc):
                    acc = kf.mul(acc, acc)
                    bit = bits_ref[0, i]        # scalar SMEM load, dynamic i
                    withm = kf.mul(acc, base)
                    return jnp.where(bit == 1, withm, acc)

                acc = jax.lax.fori_loop(0, nb, body, kf.one(TB))
                o_ref[:, :] = self._pack(acc)

            grid = (Wd // TB,)
            fn = pl.pallas_call(
                kern, grid=grid,
                in_specs=[pl.BlockSpec((Lh, TB), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, self._fermat_bits.shape[1]),
                                       lambda i: (0, 0),
                                       memory_space=pltpu.SMEM),
                          pl.BlockSpec((2, L, 128), lambda i: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((Lh, TB), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Lh, Wd), jnp.uint32),
                scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32)],
                interpret=_interpret(),
                compiler_params=_CPARAMS,
            )
            self._cache[ck] = jax.jit(fn)
        out = self._cache[ck](xpack, self._fermat_bits, self.pec._consts)
        return out[:, :Wd0]

    def batch_inv_packed(self, xpack, C: int = 32):
        """Batched field inversion of (Lh, m) packed values (any m).
        Two-level Montgomery chain + narrow Fermat. ~3 muls/element.
        Inputs not a multiple of C*TB are padded with Montgomery ones
        (self-inverse, so the chain stays correct) and sliced back."""
        Lh, m0 = xpack.shape
        TB = self.block
        if m0 <= 4 * TB:
            return self.fermat_inv(xpack)
        m = _rupn(m0, C * TB)
        if m != m0:
            one_packed = np.asarray(self.pec._consts[1, :, 0], np.uint32)
            onep = (one_packed[0::2] | (one_packed[1::2] << 16))
            pad = jnp.broadcast_to(jnp.asarray(onep)[:, None],
                                   (Lh, m - m0))
            xpack = jnp.concatenate([xpack, pad], axis=1)
        Mw = m // C
        dC = xpack.reshape(Lh, C, Mw).transpose(1, 0, 2)
        pe, bp = self.chain_fwd(dC)
        bpinv = self.batch_inv_packed(bp, C) if Mw > 4 * TB \
            else self.fermat_inv(bp)
        invC = self.chain_bwd_inv(pe, dC, bpinv)
        return invC.transpose(1, 0, 2).reshape(Lh, m)[:, :m0]

    def chain_bwd_inv(self, pe, dC, bpinv):
        """Distribute block-product inverses down the chain:
        inv[c] = running * prefix_ex[c]; running *= d[c], c = C-1..0.
        All (C, Lh, Mw) packed; bpinv (Lh, Mw). Returns inv (C, Lh, Mw)."""
        C, Lh, Mw = dC.shape
        L, TB = self.L, self.block
        ck = ("cbwd", C, Mw)
        if ck not in self._cache:
            def kern(pe_ref, d_ref, bi_ref, c_ref, o_ref, t_ref, run_ref):
                c = pl.program_id(1)
                kf = self.pec._kf(c_ref, t_ref)

                @pl.when(c == 0)
                def _():
                    run_ref[:, :] = self._unpack(bi_ref[0])

                pex = self._unpack(pe_ref[0])
                o_ref[0] = self._pack(kf.mul(run_ref[:, :], pex))
                d = self._unpack(d_ref[0])
                run_ref[:, :] = kf.mul(run_ref[:, :], d)

            grid = (Mw // TB, C)
            rev = pl.BlockSpec((1, Lh, TB), lambda m, c: (C - 1 - c, 0, m),
                               memory_space=pltpu.VMEM)
            bspec = pl.BlockSpec((1, Lh, TB), lambda m, c: (0, 0, m),
                                 memory_space=pltpu.VMEM)
            fn = pl.pallas_call(
                kern, grid=grid,
                in_specs=[rev, rev, bspec,
                          pl.BlockSpec((2, L, 128), lambda m, c: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=rev,
                out_shape=jax.ShapeDtypeStruct((C, Lh, Mw), jnp.uint32),
                scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32),
                                pltpu.VMEM((L, TB), jnp.uint32)],
                interpret=_interpret(),
                compiler_params=_CPARAMS,
            )
            self._cache[ck] = jax.jit(fn)
        return self._cache[ck](pe, dC, bpinv[None], self.pec._consts)

def _rup128(n):
    return -(-n // 128) * 128


def _rupn(n, m):
    return -(-n // m) * m


_instances = {}
_affine_instances = {}


def get_pallas_affine(field, block: int = 512) -> PallasAffine:
    key = (id(field), block)
    if key not in _affine_instances:
        _affine_instances[key] = PallasAffine(get_pallas_ec(field, block))
    return _affine_instances[key]


def get_pallas_ec(field, block: int = 512) -> PallasEC:
    key = (id(field), block)
    if key not in _instances:
        _instances[key] = PallasEC(field, block)
    return _instances[key]
