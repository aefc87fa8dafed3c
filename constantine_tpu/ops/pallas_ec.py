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
W = 16


def _interpret() -> bool:
    # On CPU backends (tests), run kernels through the Pallas interpreter.
    import os
    if os.environ.get("CTT_PALLAS_INTERPRET"):
        return os.environ["CTT_PALLAS_INTERPRET"] == "1"
    return jax.default_backend() == "cpu"


class _KF:
    """Kernel-side field ops on (L, B) planar-transposed uint32 blocks.

    Instances are built per pallas_call trace; `t_ref` is the shared
    (2L+1, B) VMEM scratch used by every multiplication in the kernel.
    """

    def __init__(self, L, p_limbs, m0, p_col, one_col, t_ref):
        self.L = L
        self.p_limbs = p_limbs          # python ints (host constants)
        self.m0 = np.uint32(m0)
        self.p_col = p_col              # (L, 1) jnp, broadcasts over lanes
        self.one_col = one_col          # (L, 1) jnp
        self.t = t_ref

    # -- Montgomery multiplication (no-shift CIOS) -------------------------

    def mul(self, a, b):
        L, t = self.L, self.t
        TB = a.shape[1]
        t[:, :] = jnp.zeros((2 * L + 1, TB), jnp.uint32)
        carry = jnp.zeros((1, TB), jnp.uint32)
        for i in range(L):
            prod = a[i:i + 1, :] * b                 # (L, TB) 16x16 exact
            t[i:i + L, :] = t[i:i + L, :] + (prod & MASK)
            t[i + 1:i + L + 1, :] = t[i + 1:i + L + 1, :] + (prod >> W)
            cur = t[i:i + 1, :] + carry
            m = (cur * self.m0) & MASK               # (1, TB)
            prod2 = m * self.p_col                   # (L, TB)
            lo2 = prod2 & MASK
            t[i:i + L, :] = t[i:i + L, :] + lo2
            t[i + 1:i + L + 1, :] = t[i + 1:i + L + 1, :] + (prod2 >> W)
            # column i is exactly 0 mod 2^16 now; carry feeds column i+1
            carry = (cur + lo2[0:1, :]) >> W
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
        return self.mul(a, a)

    # -- add/sub with ripple + conditional correction ----------------------

    def add(self, a, b):
        L = self.L
        s = a + b
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

        keys: (K, M) int32 — lane m sweeps keys[:, m] sequentially.
        qx, qy: (K, L, M) uint32 — matching affine points (pre-negated) —
        or, with packed=True, (K, L//2, M) with two 16-bit digits per u32
        (digit 2i in the low half of row i); the kernel unpacks in VMEM,
        halving the HBM read traffic of the dominant input stream.
        Returns (ekeys (K+1, M) int32, ex, ey, ez (K+1, L, M)):
        rows 0..K-1 are run-boundary emissions (key == -1 where no
        emission), row K holds each lane's final accumulator with its key.

        TPU-native replacement for the reference's CycloneMSM scheduler
        (ec_multi_scalar_mul_scheduler.nim:301-618): collision freedom
        comes from the sort, partial sums merge downstream.
        """
        K, M0 = keys.shape
        M = M0
        L = self.L
        Lin = L // 2 if packed else L
        assert qx.shape[1] == Lin, (qx.shape, Lin)
        TB = TB or self.block
        npad = -M % TB
        if npad:
            keys = jnp.pad(keys, ((0, 0), (0, npad)), constant_values=-1)
            qx = jnp.pad(qx, ((0, 0), (0, 0), (0, npad)))
            qy = jnp.pad(qy, ((0, 0), (0, 0), (0, npad)))
            M += npad
        keys = keys[:, None, :]                      # (K, 1, M) for tiling

        def unpack(v):
            # (L//2, TB) packed -> (L, TB) 16-bit digit rows
            rows = []
            for i in range(Lin):
                rows.append(v[i:i + 1, :] & MASK)
                rows.append(v[i:i + 1, :] >> W)
            return jnp.concatenate(rows, axis=0)

        ckey = ("flush", K, M, TB, packed)
        if ckey not in self._cache:
            def kern(k_ref, x_ref, y_ref, c_ref, ek_ref, ex_ref, ey_ref,
                     ez_ref, fk_ref, fx_ref, fy_ref, fz_ref,
                     t_ref, dbl_ref, acc_ref, key_ref):
                k = pl.program_id(1)
                kf = self._kf(c_ref, t_ref)

                @pl.when(k == 0)
                def _():
                    acc_ref[0] = kf.one(TB)
                    acc_ref[1] = kf.one(TB)
                    acc_ref[2] = kf.zero(TB)
                    key_ref[:, :] = jnp.full((8, TB), -1, jnp.int32)

                kk = k_ref[0, 0, :]
                X2 = unpack(x_ref[0]) if packed else x_ref[0]
                Y2 = unpack(y_ref[0]) if packed else y_ref[0]
                cur = key_ref[0, :]
                same = kk == cur
                # emit previous accumulator at run boundaries
                ek_ref[0, 0, :] = jnp.where(same, -1, cur)
                ex_ref[0] = acc_ref[0]
                ey_ref[0] = acc_ref[1]
                ez_ref[0] = acc_ref[2]
                # grown = acc + Q ; fresh = Q (new run)
                gX, gY, gZ = kf.ec_madd(acc_ref[0], acc_ref[1], acc_ref[2],
                                        X2, Y2, dbl_ref)
                one = kf.one(TB)
                acc_ref[0] = kf.sel(same, gX, X2)
                acc_ref[1] = kf.sel(same, gY, Y2)
                acc_ref[2] = kf.sel(same, gZ, one)
                key_ref[0, :] = kk
                # lane finals (last write wins at k == K-1)
                fk_ref[0, 0, :] = kk
                fx_ref[0] = acc_ref[0]
                fy_ref[0] = acc_ref[1]
                fz_ref[0] = acc_ref[2]

            grid = (M // TB, K)
            kspec = pl.BlockSpec((1, 1, TB), lambda m, k: (k, 0, m),
                                 memory_space=pltpu.VMEM)
            inspec = pl.BlockSpec((1, Lin, TB), lambda m, k: (k, 0, m),
                                  memory_space=pltpu.VMEM)
            pspec = pl.BlockSpec((1, L, TB), lambda m, k: (k, 0, m),
                                 memory_space=pltpu.VMEM)
            fkspec = pl.BlockSpec((1, 1, TB), lambda m, k: (0, 0, m),
                                  memory_space=pltpu.VMEM)
            fspec = pl.BlockSpec((1, L, TB), lambda m, k: (0, 0, m),
                                 memory_space=pltpu.VMEM)
            fn = pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[kspec, inspec, inspec,
                          pl.BlockSpec((2, L, 128), lambda m, k: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[kspec, pspec, pspec, pspec,
                           fkspec, fspec, fspec, fspec],
                out_shape=[jax.ShapeDtypeStruct((K, 1, M), jnp.int32)]
                + [jax.ShapeDtypeStruct((K, L, M), jnp.uint32)] * 3
                + [jax.ShapeDtypeStruct((1, 1, M), jnp.int32)]
                + [jax.ShapeDtypeStruct((1, L, M), jnp.uint32)] * 3,
                scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32),
                                pltpu.VMEM((3, L, TB), jnp.uint32),
                                pltpu.VMEM((3, L, TB), jnp.uint32),
                                pltpu.VMEM((8, TB), jnp.int32)],
                interpret=_interpret(),
            )
            self._cache[ckey] = jax.jit(fn)
        ek, ex, ey, ez, fk, fx, fy, fz = self._cache[ckey](
            keys, qx, qy, self._consts)
        ek, fk = ek[:, 0, :], fk[:, 0, :]
        ekeys = jnp.concatenate([ek, fk], axis=0)[:, :M0]
        ex = jnp.concatenate([ex, fx], axis=0)[:, :, :M0]
        ey = jnp.concatenate([ey, fy], axis=0)[:, :, :M0]
        ez = jnp.concatenate([ez, fz], axis=0)[:, :, :M0]
        return ekeys, ex, ey, ez

    def merge_scan(self, keys, qx, qy, qz, TB: int = None):
        """Like flush_scan but the stream entries are Jacobian partial sums
        (merging pass over flush emissions). Entries with key <= 0 are
        treated as neutral padding."""
        K, M0 = keys.shape
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
            def kern(k_ref, x_ref, y_ref, z_ref, c_ref, ek_ref, ex_ref,
                     ey_ref, ez_ref, fk_ref, fx_ref, fy_ref, fz_ref,
                     t_ref, dbl_ref, acc_ref, key_ref):
                k = pl.program_id(1)
                kf = self._kf(c_ref, t_ref)

                @pl.when(k == 0)
                def _():
                    acc_ref[0] = kf.one(TB)
                    acc_ref[1] = kf.one(TB)
                    acc_ref[2] = kf.zero(TB)
                    key_ref[:, :] = jnp.full((8, TB), -1, jnp.int32)

                kk = k_ref[0, 0, :]
                X2, Y2, Z2 = x_ref[0], y_ref[0], z_ref[0]
                # neutralize padding entries (key <= 0)
                padm = kk <= 0
                Z2 = kf.sel(padm, kf.zero(TB), Z2)
                cur = key_ref[0, :]
                same = kk == cur
                ek_ref[0, 0, :] = jnp.where(same, -1, cur)
                ex_ref[0] = acc_ref[0]
                ey_ref[0] = acc_ref[1]
                ez_ref[0] = acc_ref[2]
                gX, gY, gZ = kf.ec_add(acc_ref[0], acc_ref[1], acc_ref[2],
                                       X2, Y2, Z2, dbl_ref)
                acc_ref[0] = kf.sel(same, gX, X2)
                acc_ref[1] = kf.sel(same, gY, Y2)
                acc_ref[2] = kf.sel(same, gZ, Z2)
                key_ref[0, :] = kk
                fk_ref[0, 0, :] = kk
                fx_ref[0] = acc_ref[0]
                fy_ref[0] = acc_ref[1]
                fz_ref[0] = acc_ref[2]

            grid = (M // TB, K)
            kspec = pl.BlockSpec((1, 1, TB), lambda m, k: (k, 0, m),
                                 memory_space=pltpu.VMEM)
            pspec = pl.BlockSpec((1, L, TB), lambda m, k: (k, 0, m),
                                 memory_space=pltpu.VMEM)
            fkspec = pl.BlockSpec((1, 1, TB), lambda m, k: (0, 0, m),
                                  memory_space=pltpu.VMEM)
            fspec = pl.BlockSpec((1, L, TB), lambda m, k: (0, 0, m),
                                 memory_space=pltpu.VMEM)
            fn = pl.pallas_call(
                kern,
                grid=grid,
                in_specs=[kspec, pspec, pspec, pspec,
                          pl.BlockSpec((2, L, 128), lambda m, k: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=[kspec, pspec, pspec, pspec,
                           fkspec, fspec, fspec, fspec],
                out_shape=[jax.ShapeDtypeStruct((K, 1, M), jnp.int32)]
                + [jax.ShapeDtypeStruct((K, L, M), jnp.uint32)] * 3
                + [jax.ShapeDtypeStruct((1, 1, M), jnp.int32)]
                + [jax.ShapeDtypeStruct((1, L, M), jnp.uint32)] * 3,
                scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32),
                                pltpu.VMEM((3, L, TB), jnp.uint32),
                                pltpu.VMEM((3, L, TB), jnp.uint32),
                                pltpu.VMEM((8, TB), jnp.int32)],
                interpret=_interpret(),
            )
            self._cache[ckey] = jax.jit(fn)
        ek, ex, ey, ez, fk, fx, fy, fz = self._cache[ckey](
            keys, qx, qy, qz, self._consts)
        ek, fk = ek[:, 0, :], fk[:, 0, :]
        ekeys = jnp.concatenate([ek, fk], axis=0)[:, :M0]
        ex = jnp.concatenate([ex, fx], axis=0)[:, :, :M0]
        ey = jnp.concatenate([ey, fy], axis=0)[:, :, :M0]
        ez = jnp.concatenate([ez, fz], axis=0)[:, :, :M0]
        return ekeys, ex, ey, ez

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
            )
            self._cache[ckey] = jax.jit(fn)
        ox, oy, oz = self._cache[ckey](X, Y, Z, self._consts)
        return ox[:, :Wn], oy[:, :Wn], oz[:, :Wn]


_instances = {}


def get_pallas_ec(field, block: int = 512) -> PallasEC:
    key = (id(field), block)
    if key not in _instances:
        _instances[key] = PallasEC(field, block)
    return _instances[key]
