"""Fused Pallas pairing kernels: Miller loop + final exponentiation.

The XLA tower path (ops/pairing.py) is correct but op-launch-bound: a
batch-B pairing lowers to thousands of tiny HLO ops, each paying fixed
overhead, so throughput only approaches the VPU limit at B ~ 2048
(BENCH_r04_full: 0.29x reference at that batch, 100x off below it). These
kernels run the ENTIRE optimal-ate pairing — 63 Miller iterations, line
evaluations, sparse Fp12 muls, the easy part (with an in-kernel Fermat
inversion) and the hard part — as TWO Pallas programs, so a pairing is a
single pair of kernel launches regardless of batch.

Reference structure being re-expressed (cited per routine below):
  lines_eval.nim:231-281 (fused double/add + line eval),
  miller_loops.nim:42-286, cyclotomic_subgroups.nim:218-377,
  pairings_bls12.nim:100-180.

Design (v5e measurements drove all of it):
* Field elements ride planar-transposed (L, TB) uint32 blocks, batch on
  lanes, exactly like ops/pallas_ec.py. Tower elements are tuples of Fp
  blocks (Fp2 pairs, Fp6 triples of pairs, Fp12 = 2 x Fp6).
* The Montgomery mul here is the COMPACT shift-based CIOS: a fori_loop
  whose carry is the (L, TB) accumulator value itself (no VMEM scratch, so
  independent muls have no false dependencies, and the traced program
  stays ~20 ops per mul site — the unrolled no-shift kernel of pallas_ec
  would blow the Mosaic module size at ~200 ops x thousands of mul sites).
* add/sub/tails use the Kogge-Stone log-depth carry propagation
  (pallas_ec norm_ks): this kernel is one long dependency chain, where the
  serial ripple's L x 30-cycle latency is NOT hidden by neighbors.
* The Miller loop is ONE fori_loop over the 63 static bits of |x| with the
  add-step masked by the bit (read from SMEM) — the BN-style dense body
  (ops/pairing.py BNPairing) chosen over zero-run unrolling to keep the
  trace small; the ~10% wasted add-step work is invisible next to the
  op-launch overhead it removes.
* The final-exp hard part runs as a MICROCODE INTERPRETER: a static
  program of (op, dst, src1, src2) steps (host-built from the verified
  (x-1)^2 (x+p) (x^2+p^2-1) + 3 decomposition) executed by one fori_loop
  over SMEM, with six predicated op bodies (cyclotomic square, Fp12 mul,
  conj, Frobenius p / p^2, copy) and Fp12 registers in VMEM scratch. This
  keeps the traced program ONE op-set wide instead of 5 unrolled pow_x
  chains (~70k traced ops -> ~25k).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_ec import _KF, _CPARAMS, _interpret, MASK, W


class _CKF(_KF):
    """Compact kernel field: fori-loop CIOS (tiny trace, no scratch) and
    KS carry tails. Drop-in for _KF inside trace-size-constrained kernels.
    """

    def __init__(self, L, p_limbs, m0, p_col, one_col):
        super().__init__(L, p_limbs, m0, p_col, one_col, t_ref=None,
                         ks=True)

    def mul(self, a, b):
        """Montgomery mul, shift-based CIOS as a fori_loop.

        a, b: (L, TB) canonical digits (b may be (L, 1), broadcast over
        lanes). The accumulator t is the fori carry — a plain SSA value —
        so Mosaic sees no false dependencies between independent muls.
        limbs_montgomery.nim:57-180 is the algorithm spec; the shift is a
        static row-slice concat, the a-digit walk a pltpu.roll.
        """
        L = self.L
        TB = a.shape[1]
        z1 = jnp.zeros((1, TB), jnp.uint32)

        def body(_i, st):
            t, ar = st
            ai = ar[0:1, :]
            prod = ai * b                            # (L, TB)
            lo = prod & MASK
            cur = t[0:1, :] + lo[0:1, :]
            m = (cur * self.m0) & MASK
            p2 = m * self.p_col
            lo2 = p2 & MASK
            carry = (cur + lo2[0:1, :]) >> W
            u = t + (lo + lo2)
            hi = (prod >> W) + (p2 >> W)
            t2 = jnp.concatenate([u[1:], z1], axis=0) + hi \
                + jnp.concatenate([carry, jnp.zeros((L - 1, TB),
                                                    jnp.uint32)], axis=0)
            # rotate a's digit rows by -1 (concat form: pltpu.roll trips a
            # Mosaic ApplyVectorLayout check at TB >= 256)
            return (t2, jnp.concatenate([ar[1:], ar[:1]], axis=0))

        t0 = jnp.zeros((L, TB), jnp.uint32)
        a_full = jnp.broadcast_to(a, (L, TB))
        t, _ = jax.lax.fori_loop(0, L, body, (t0, a_full))
        # t holds the value (< 2p after reduction bound), digits < 2^23
        out, co = self.norm_ks(t, pre_rounds=1)
        from .pallas_ec import _inc0
        u2 = _inc0(out + self._comp_p1)
        out2, co2 = self.norm_ks(u2, pre_rounds=0)
        return jnp.where(((co + co2) > 0)[None, :], out2, out)

    def sq(self, a):
        return self.mul(a, a)

    def neg(self, a):
        """p - a (0 stays 0): sub's borrow path handles a == 0."""
        return self.sub(jnp.zeros_like(a), a)

    def div2(self, a):
        """a/2 mod p: (a + p*odd(a)) >> 1 digit-wise (finite_fields.nim
        div2 analogue)."""
        odd = (a[0:1, :] & jnp.uint32(1))
        t = a + self.p_col * odd                     # digits <= 2^17-1
        t, co = self.norm_ks(t, pre_rounds=0)
        # logical shift right by 1 bit across the digit vector; the
        # carry-out bit (value overflow 2^16L impossible: a+p < 2^16L)
        top = jnp.concatenate([t[1:], co[None].astype(jnp.uint32)], axis=0)
        return (t >> jnp.uint32(1)) | ((top & jnp.uint32(1)) << jnp.uint32(15))


# ---------------------------------------------------------------------------
# kernel-side tower arithmetic (tuples of (L, TB) Fp blocks)
# ---------------------------------------------------------------------------
# Conventions match ops/towers.py build_tower for BLS12-381:
#   Fp2  = Fp[u]/(u^2 + 1)          element: (c0, c1)
#   Fp6  = Fp2[v]/(v^3 - xi), xi = 1 + u    element: (a0, a1, a2)
#   Fp12 = Fp6[w]/(w^2 - v)         element: (c0, c1)
# Dense Fp12 component order (towers.py join): [A0 A1 A2 B0 B1 B2] with
# w-degrees [0, 2, 4, 1, 3, 5] — bit-exact interchange with the XLA path.


def f2add(kf, a, b):
    return (kf.add(a[0], b[0]), kf.add(a[1], b[1]))


def f2sub(kf, a, b):
    return (kf.sub(a[0], b[0]), kf.sub(a[1], b[1]))


def f2neg(kf, a):
    return (kf.neg(a[0]), kf.neg(a[1]))


def f2dbl(kf, a):
    return (kf.add(a[0], a[0]), kf.add(a[1], a[1]))


def f2conj(kf, a):
    return (a[0], kf.neg(a[1]))


def f2small(kf, a, k: int):
    assert k in (2, 3, 4)
    d = f2dbl(kf, a)
    if k == 2:
        return d
    if k == 3:
        return f2add(kf, d, a)
    return f2dbl(kf, d)


def f2mul(kf, a, b):
    """Karatsuba over u^2 = -1 (3 Fp muls)."""
    v0 = kf.mul(a[0], b[0])
    v1 = kf.mul(a[1], b[1])
    t = kf.mul(kf.add(a[0], a[1]), kf.add(b[0], b[1]))
    return (kf.sub(v0, v1), kf.sub(kf.sub(t, v0), v1))


def f2sq(kf, a):
    """Complex squaring (2 Fp muls)."""
    c0 = kf.mul(kf.add(a[0], a[1]), kf.sub(a[0], a[1]))
    t = kf.mul(a[0], a[1])
    return (c0, kf.add(t, t))


def f2xi(kf, a):
    """xi * a with xi = 1 + u: (c0 - c1, c0 + c1)."""
    return (kf.sub(a[0], a[1]), kf.add(a[0], a[1]))


def f2mul_fp(kf, a, s):
    return (kf.mul(a[0], s), kf.mul(a[1], s))


def f2div2(kf, a):
    return (kf.div2(a[0]), kf.div2(a[1]))


def f6add(kf, a, b):
    return tuple(f2add(kf, x, y) for x, y in zip(a, b))


def f6sub(kf, a, b):
    return tuple(f2sub(kf, x, y) for x, y in zip(a, b))


def f6neg(kf, a):
    return tuple(f2neg(kf, x) for x in a)


def f6mul(kf, a, b):
    """Karatsuba cubic (6 Fp2 muls) — CubicExt.mul (towers.py) port."""
    a0, a1, a2 = a
    b0, b1, b2 = b
    v0 = f2mul(kf, a0, b0)
    v1 = f2mul(kf, a1, b1)
    v2 = f2mul(kf, a2, b2)
    m12 = f2mul(kf, f2add(kf, a1, a2), f2add(kf, b1, b2))
    m01 = f2mul(kf, f2add(kf, a0, a1), f2add(kf, b0, b1))
    m02 = f2mul(kf, f2add(kf, a0, a2), f2add(kf, b0, b2))
    t0 = f2sub(kf, f2sub(kf, m12, v1), v2)
    t1 = f2sub(kf, f2sub(kf, m01, v0), v1)
    t2 = f2sub(kf, f2sub(kf, m02, v0), v2)
    c0 = f2add(kf, v0, f2xi(kf, t0))
    c1 = f2add(kf, t1, f2xi(kf, v2))
    c2 = f2add(kf, t2, v1)
    return (c0, c1, c2)


def f6sq(kf, a):
    """Chung-Hasan SQR2 (2 sq + 3 mul-ish = 5 Fp2 mul-equivalents)."""
    a0, a1, a2 = a
    t = f2sub(kf, f2add(kf, a0, a2), a1)
    s0 = f2sq(kf, a0)
    ab = f2mul(kf, a0, a1)
    s2 = f2sq(kf, t)
    bc = f2mul(kf, a1, a2)
    s4 = f2sq(kf, a2)
    s1 = f2add(kf, ab, ab)
    s3 = f2add(kf, bc, bc)
    c0 = f2add(kf, s0, f2xi(kf, s3))
    c1 = f2add(kf, s1, f2xi(kf, s4))
    c2 = f2sub(kf, f2sub(kf, f2add(kf, f2add(kf, s1, s2), s3), s0), s4)
    return (c0, c1, c2)


def f6mul_v(kf, a):
    """v * a: (xi*a2, a0, a1)."""
    return (f2xi(kf, a[2]), a[0], a[1])


def f6mul_sparse12(kf, a, b1, b2):
    """a * (b1 v + b2 v^2):
    c0 = xi (a1 b2 + a2 b1); c1 = a0 b1 + xi a2 b2; c2 = a0 b2 + a1 b1."""
    a0, a1, a2 = a
    p01 = f2mul(kf, a0, b1)
    p02 = f2mul(kf, a0, b2)
    p11 = f2mul(kf, a1, b1)
    p12 = f2mul(kf, a1, b2)
    p21 = f2mul(kf, a2, b1)
    p22 = f2mul(kf, a2, b2)
    c0 = f2xi(kf, f2add(kf, p12, p21))
    c1 = f2add(kf, p01, f2xi(kf, p22))
    c2 = f2add(kf, p02, p11)
    return (c0, c1, c2)


def f6mul_fp2(kf, a, s):
    """a * (s in slot 0) = componentwise Fp2 mul."""
    return tuple(f2mul(kf, x, s) for x in a)


def f12mul(kf, a, b):
    """Karatsuba quadratic over Fp6 (3 Fp6 muls = 18 Fp2 muls)."""
    a0, a1 = a
    b0, b1 = b
    v0 = f6mul(kf, a0, b0)
    v1 = f6mul(kf, a1, b1)
    t = f6mul(kf, f6add(kf, a0, a1), f6add(kf, b0, b1))
    c0 = f6add(kf, v0, f6mul_v(kf, v1))
    c1 = f6sub(kf, f6sub(kf, t, v0), v1)
    return (c0, c1)


def f12sq(kf, a):
    """2 Fp6 muls: c1 = 2 a0 a1; c0 = (a0+a1)(a0+v a1) - t - v t."""
    a0, a1 = a
    t = f6mul(kf, a0, a1)
    vt = f6mul_v(kf, t)
    u = f6mul(kf, f6add(kf, a0, a1), f6add(kf, a0, f6mul_v(kf, a1)))
    c0 = f6sub(kf, f6sub(kf, u, t), vt)
    c1 = f6add(kf, t, t)
    return (c0, c1)


def f12conj(kf, a):
    """f^(p^6): negate the w-odd half."""
    return (a[0], f6neg(kf, a[1]))


def f12sparse_line(kf, f, lA, lC, lB):
    """f * line for the M-twist line (A=(lA,0,0), B=(0,lC,lB)) — the
    sparse Fp12 product (lines_eval.nim:1347 family, re-derived):
    15 Fp2 muls vs 18 dense."""
    F0, F1 = f
    v0 = f6mul_fp2(kf, F0, lA)                       # 3 Fp2 muls
    v1 = f6mul_sparse12(kf, F1, lC, lB)              # 6 Fp2 muls
    s = (lA, lC, lB)                                  # L0 + L1 dense
    t = f6mul(kf, f6add(kf, F0, F1), s)              # 6 Fp2 muls
    c0 = f6add(kf, v0, f6mul_v(kf, v1))
    c1 = f6sub(kf, f6sub(kf, t, v0), v1)
    return (c0, c1)


def f12cyc_sq(kf, a):
    """Granger-Scott cyclotomic squaring (input unitary) — port of
    ops/pairing.py cyclotomic_square / cyclotomic_subgroups.nim:277-353.
    b ordering: [A0 A1 A2 B0 B1 B2]."""
    b = [a[0][0], a[0][1], a[0][2], a[1][0], a[1][1], a[1][2]]

    def sq4(x, y):
        xx = f2sq(kf, x)
        yy = f2sq(kf, y)
        c0 = f2add(kf, xx, f2xi(kf, yy))
        c1 = f2sub(kf, f2sub(kf, f2sq(kf, f2add(kf, x, y)), xx), yy)
        return c0, c1

    v0 = sq4(b[0], b[4])
    v1 = sq4(b[3], b[2])
    v2 = sq4(b[1], b[5])

    def m32(v, bb):                                   # 3v - 2bb
        t = f2sub(kf, v, bb)
        return f2add(kf, f2add(kf, t, t), v)

    def p32(v, bb):                                   # 3v + 2bb
        t = f2add(kf, v, bb)
        return f2add(kf, f2add(kf, t, t), v)

    nb0 = m32(v0[0], b[0])
    nb1 = m32(v1[0], b[1])
    nb2 = m32(v2[0], b[2])
    nb3 = p32(f2xi(kf, v2[1]), b[3])
    nb4 = p32(v0[1], b[4])
    nb5 = p32(v1[1], b[5])
    return ((nb0, nb1, nb2), (nb3, nb4, nb5))


def f12frob(kf, a, gam):
    """f^(p^k): componentwise conj (odd k) + gamma mul. gam: list of 6
    Fp2 constants ((L,1) pairs) in component order, or None entries for
    gamma == 1; `conj` flag folded by caller via gam[-1]."""
    gammas, odd = gam
    comps = [a[0][0], a[0][1], a[0][2], a[1][0], a[1][1], a[1][2]]
    out = []
    for k in range(6):
        c = comps[k]
        if odd:
            c = f2conj(kf, c)
        g = gammas[k]
        if g is None:
            out.append(c)
        else:
            out.append(f2mul(kf, c, g))
    return ((out[0], out[1], out[2]), (out[3], out[4], out[5]))


def f2sel(cond, a, b):
    """Scalar- or lane-mask select on Fp2 pairs."""
    return (jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1]))


def f12sel(cond, a, b):
    return (tuple(f2sel(cond, x, y) for x, y in zip(a[0], b[0])),
            tuple(f2sel(cond, x, y) for x, y in zip(a[1], b[1])))


# ---------------------------------------------------------------------------
# Miller-step bodies (M-twist, homogeneous projective G2 — the same
# formulas as ops/pairing.py _dbl_step/_add_step, lines_eval.nim:231-281)
# ---------------------------------------------------------------------------


def _dbl_step(kf, T, b2):
    X, Y, Z = T
    B = f2sq(kf, Y)
    C = f2sq(kf, Z)
    E = f2small(kf, f2mul(kf, b2, C), 3)             # 3 b' Z^2
    F3 = f2small(kf, E, 3)
    A = f2div2(kf, f2mul(kf, X, Y))                  # XY/2
    G = f2div2(kf, f2add(kf, B, F3))                 # (B+3E)/2
    H = f2sub(kf, f2sub(kf, f2sq(kf, f2add(kf, Y, Z)), B), C)   # 2YZ
    X3 = f2mul(kf, A, f2sub(kf, B, F3))
    Y3 = f2sub(kf, f2sq(kf, G), f2small(kf, f2sq(kf, E), 3))
    Z3 = f2mul(kf, B, H)
    XX = f2sq(kf, X)
    sA = f2mul(kf, H, Z)                             # 2YZ^2
    sC = f2sub(kf, f2mul(kf, f2small(kf, XX, 3), X),
               f2mul(kf, f2dbl(kf, B), Z))           # 3X^3 - 2Y^2 Z
    sB = f2neg(kf, f2mul(kf, f2small(kf, XX, 3), Z))  # -3X^2 Z
    return (X3, Y3, Z3), (sA, sB, sC)


def _add_step(kf, T, Q):
    X, Y, Z = T
    xQ, yQ = Q
    theta = f2sub(kf, Y, f2mul(kf, yQ, Z))
    lam = f2sub(kf, X, f2mul(kf, xQ, Z))
    t2 = f2sq(kf, theta)
    l2 = f2sq(kf, lam)
    l3c = f2mul(kf, l2, lam)
    H = f2add(kf, f2sub(kf, f2mul(kf, t2, Z),
                        f2small(kf, f2mul(kf, l2, X), 2)), l3c)
    X3 = f2mul(kf, lam, H)
    Y3 = f2sub(kf, f2mul(kf, theta, f2sub(kf, f2mul(kf, l2, X), H)),
               f2mul(kf, Y, l3c))
    Z3 = f2mul(kf, l3c, Z)
    sA = lam
    sC = f2sub(kf, f2mul(kf, theta, xQ), f2mul(kf, lam, yQ))
    sB = f2neg(kf, theta)
    return (X3, Y3, Z3), (sA, sB, sC)


def _emit_line(kf, line, xP, yP):
    """M-twist line assembly: lA = yP * xi * sA ; lB = xP * sB ; lC = sC
    (ops/pairing.py _emit_line M branch)."""
    sA, sB, sC = line
    lA = f2mul_fp(kf, f2xi(kf, sA), yP)
    lB = f2mul_fp(kf, sB, xP)
    return lA, sC, lB


# ---------------------------------------------------------------------------
# the two kernels
# ---------------------------------------------------------------------------


def _flat12(f):
    return [f[0][0][0], f[0][0][1], f[0][1][0], f[0][1][1],
            f[0][2][0], f[0][2][1], f[1][0][0], f[1][0][1],
            f[1][1][0], f[1][1][1], f[1][2][0], f[1][2][1]]


def _unflat12(rows):
    return (((rows[0], rows[1]), (rows[2], rows[3]), (rows[4], rows[5])),
            ((rows[6], rows[7]), (rows[8], rows[9]), (rows[10], rows[11])))


def _fp_inv_fermat(kf, x, bits_ref, nb):
    """x^(p-2) via the SMEM bit array (MSB first, bits[0] == 1)."""
    def body(i, acc):
        acc = kf.mul(acc, acc)
        withm = kf.mul(acc, x)
        return jnp.where(bits_ref[0, i] == 1, withm, acc)
    return jax.lax.fori_loop(1, nb, body, x)


def _f2inv(kf, a, bits_ref, nb):
    norm = kf.add(kf.sq(a[0]), kf.sq(a[1]))          # u^2 = -1
    ninv = _fp_inv_fermat(kf, norm, bits_ref, nb)
    return (kf.mul(a[0], ninv), kf.neg(kf.mul(a[1], ninv)))


def _f6inv(kf, a, bits_ref, nb):
    a0, a1, a2 = a
    v0 = f2sub(kf, f2sq(kf, a0), f2xi(kf, f2mul(kf, a1, a2)))
    v1 = f2sub(kf, f2xi(kf, f2sq(kf, a2)), f2mul(kf, a0, a1))
    v2 = f2sub(kf, f2sq(kf, a1), f2mul(kf, a0, a2))
    Fv = f2add(kf, f2mul(kf, a0, v0),
               f2xi(kf, f2add(kf, f2mul(kf, a2, v1), f2mul(kf, a1, v2))))
    Finv = _f2inv(kf, Fv, bits_ref, nb)
    return (f2mul(kf, v0, Finv), f2mul(kf, v1, Finv), f2mul(kf, v2, Finv))


def _f12inv(kf, a, bits_ref, nb):
    a0, a1 = a
    d = f6sub(kf, f6sq(kf, a0), f6mul_v(kf, f6sq(kf, a1)))
    dinv = _f6inv(kf, d, bits_ref, nb)
    return (f6mul(kf, a0, dinv), f6neg(kf, f6mul(kf, a1, dinv)))


# hard-part microcode ops
OP_SQ, OP_MUL, OP_CONJ, OP_FROB1, OP_FROB2, OP_COPY = range(6)
RG_F, RG_T1, RG_T2, RG_ACC, RG_BASE, RG_TMP = range(6)


def _build_hard_program(x_abs: int, x_neg: bool):
    """Host-built microcode for the BLS12 hard part
    (x-1)^2 (x+p) (x^2+p^2-1) + 3 — mirrors ops/pairing.py final_exp
    (identity asserted there at build time). Result lands in RG_T1."""
    prog = []

    def powx(src):
        """RG_ACC <- src^x (conj for x < 0; operands unitary)."""
        prog.append((OP_COPY, RG_BASE, src, 0))
        prog.append((OP_COPY, RG_ACC, src, 0))
        for b in [int(c) for c in bin(x_abs)[3:]]:
            prog.append((OP_SQ, RG_ACC, RG_ACC, 0))
            if b:
                prog.append((OP_MUL, RG_ACC, RG_ACC, RG_BASE))
        if x_neg:
            prog.append((OP_CONJ, RG_ACC, RG_ACC, 0))

    # t1 = f^((x-1)^2)
    powx(RG_F)
    prog.append((OP_CONJ, RG_TMP, RG_F, 0))
    prog.append((OP_MUL, RG_T1, RG_ACC, RG_TMP))
    powx(RG_T1)
    prog.append((OP_CONJ, RG_TMP, RG_T1, 0))
    prog.append((OP_MUL, RG_T1, RG_ACC, RG_TMP))
    # t2 = t1^(x+p)
    powx(RG_T1)
    prog.append((OP_FROB1, RG_TMP, RG_T1, 0))
    prog.append((OP_MUL, RG_T2, RG_ACC, RG_TMP))
    # t3 = t2^(x^2+p^2-1)
    powx(RG_T2)
    prog.append((OP_COPY, RG_T1, RG_ACC, 0))
    powx(RG_T1)
    prog.append((OP_FROB2, RG_TMP, RG_T2, 0))
    prog.append((OP_MUL, RG_ACC, RG_ACC, RG_TMP))
    prog.append((OP_CONJ, RG_TMP, RG_T2, 0))
    prog.append((OP_MUL, RG_ACC, RG_ACC, RG_TMP))
    # out = t3 * f^3
    prog.append((OP_SQ, RG_TMP, RG_F, 0))
    prog.append((OP_MUL, RG_ACC, RG_ACC, RG_TMP))
    prog.append((OP_MUL, RG_T1, RG_ACC, RG_F))
    return np.asarray(prog, np.int32)


class PallasPairing:
    """BLS12-381 optimal-ate pairing as fused Pallas kernels.

    Public methods take/return STANDARD-layout arrays ((B, L) Fp /
    (B, 2, L) Fp2 / (B, 12, L) Fp12, Montgomery form) and are meant to be
    composed inside a caller jit; transposes to the kernel-side planar
    layout happen in-graph.
    """

    def __init__(self, block: int = 512, fe_block: int = 256):
        from ..named.precompute import get_curve
        from .pairing import get_pairing
        pr = get_pairing("BLS12_381")                 # host constants
        assert pr.twist == "M"
        ctx = pr.ctx
        F = ctx.fp
        self.F = F
        self.L = L = F.L
        self.block = block
        self.fe_block = fe_block
        self._p_limbs = tuple(int(v) for v in F.p)
        self._m0 = np.uint32(F.m0ninv)
        self.x_abs = pr.x_abs
        self.x_neg = pr.x_neg
        self.fp12 = pr.fp12

        # consts: row 0 p, row 1 one, 2..13 gamma1 (6 x Fp2), 14..25 gamma2
        consts = np.zeros((26, L, 128), np.uint32)
        consts[0] = np.asarray(F.p, np.uint32)[:, None]
        consts[1] = np.asarray(F.one, np.uint32)[:, None]
        for k in range(6):
            consts[2 + 2 * k] = pr.gamma1[k][0][:, None]
            consts[3 + 2 * k] = pr.gamma1[k][1][:, None]
            consts[14 + 2 * k] = pr.gamma2[k][0][:, None]
            consts[15 + 2 * k] = pr.gamma2[k][1][:, None]
        self._consts = consts

        mb = [int(c) for c in bin(self.x_abs)[3:]]    # bits after MSB
        self._mbits = np.asarray(mb, np.int32)[None]  # (1, 63)
        fb = [int(c) for c in bin(F.p_int - 2)[2:]]
        self._fbits = np.asarray(fb, np.int32)[None]  # (1, nb)
        self._prog = _build_hard_program(self.x_abs, self.x_neg)
        self._cache = {}

    # -- kernel plumbing ---------------------------------------------------

    @staticmethod
    def _wide(row, TB):
        """(L, 128) const row -> dense (L, TB). (L, 1)-shaped constants
        broadcast over >128 lanes trip a Mosaic ApplyVectorLayout check
        ("limits[i] <= dim(i)"), so constants are kept lane-dense."""
        k = TB // 128
        return row if k == 1 else jnp.concatenate([row] * k, axis=1)

    def _kf(self, c_ref, TB):
        return _CKF(self.L, self._p_limbs, self._m0,
                    self._wide(c_ref[0], TB), self._wide(c_ref[1], TB))

    def _gam(self, c_ref, power, TB):
        base = 2 if power == 1 else 14
        gs = [None]                                    # gamma[0] == 1
        for k in range(1, 6):
            gs.append((self._wide(c_ref[base + 2 * k], TB),
                       self._wide(c_ref[base + 2 * k + 1], TB)))
        return (gs, power % 2 == 1)

    def _miller_fn(self, Bp, TB):
        key = ("miller", Bp, TB)
        if key in self._cache:
            return self._cache[key]
        L = self.L
        nmb = self._mbits.shape[1]

        def kern(mb_ref, xp, yp, xq0, xq1, yq0, yq1, c_ref, o_ref):
            kf = self._kf(c_ref, TB)
            one = kf.one_col
            four = kf.add(kf.add(one, one), kf.add(one, one))
            b2 = (four, four)
            xP = xp[:, :]
            yP = yp[:, :]
            Q = ((xq0[:, :], xq1[:, :]), (yq0[:, :], yq1[:, :]))
            zero = jnp.zeros((L, TB), jnp.uint32)
            f = (((one, zero), (zero, zero), (zero, zero)),
                 ((zero, zero), (zero, zero), (zero, zero)))
            T = (Q[0], Q[1], (one, zero))

            def body(i, st):
                f, T = st
                f = f12sq(kf, f)
                T, ln = _dbl_step(kf, T, b2)
                lA, lC, lB = _emit_line(kf, ln, xP, yP)
                f = f12sparse_line(kf, f, lA, lC, lB)
                Ta, lna = _add_step(kf, T, Q)
                lA, lC, lB = _emit_line(kf, lna, xP, yP)
                fa = f12sparse_line(kf, f, lA, lC, lB)
                take = mb_ref[0, i] == 1
                f = f12sel(take, fa, f)
                T = tuple(f2sel(take, a, b) for a, b in zip(Ta, T))
                return (f, T)

            f, T = jax.lax.fori_loop(0, nmb, body, (f, T))
            if self.x_neg:
                f = f12conj(kf, f)
            rows = _flat12(f)
            for k in range(12):
                o_ref[k] = rows[k]

        fn = pl.pallas_call(
            kern,
            grid=(Bp // TB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec((L, TB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)] * 6
            + [pl.BlockSpec((26, L, 128), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((12, L, TB), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((12, L, Bp), jnp.uint32),
            interpret=_interpret(),
            compiler_params=_CPARAMS,
        )
        self._cache[key] = fn
        return fn

    def _final_exp_fn(self, Bp, TB):
        key = ("fexp", Bp, TB)
        if key in self._cache:
            return self._cache[key]
        L = self.L
        nb = self._fbits.shape[1]
        NS = self._prog.shape[0]

        def kern(fb_ref, pg_ref, f_ref, c_ref, o_ref, regs):
            kf = self._kf(c_ref, TB)
            f = _unflat12([f_ref[k] for k in range(12)])
            # easy part: f^((p^6-1)(p^2+1))
            finv = _f12inv(kf, f, fb_ref, nb)
            g = f12mul(kf, f12conj(kf, f), finv)
            g = f12mul(kf, f12frob(kf, g, self._gam(c_ref, 2, TB)), g)
            rows = _flat12(g)
            for k in range(12):
                regs[RG_F, k] = rows[k]

            def step(i, _):
                op = pg_ref[i, 0]
                dst = pg_ref[i, 1]
                s1 = pg_ref[i, 2]
                s2 = pg_ref[i, 3]
                A = _unflat12([regs[s1, k] for k in range(12)])
                Bv = _unflat12([regs[s2, k] for k in range(12)])

                def store(val):
                    vr = _flat12(val)
                    for k in range(12):
                        regs[dst, k] = vr[k]

                @pl.when(op == OP_SQ)
                def _():
                    store(f12cyc_sq(kf, A))

                @pl.when(op == OP_MUL)
                def _():
                    store(f12mul(kf, A, Bv))

                @pl.when(op == OP_CONJ)
                def _():
                    store(f12conj(kf, A))

                @pl.when(op == OP_FROB1)
                def _():
                    store(f12frob(kf, A, self._gam(c_ref, 1, TB)))

                @pl.when(op == OP_FROB2)
                def _():
                    store(f12frob(kf, A, self._gam(c_ref, 2, TB)))

                @pl.when(op == OP_COPY)
                def _():
                    store(A)
                return 0

            jax.lax.fori_loop(0, NS, step, 0)
            for k in range(12):
                o_ref[k] = regs[RG_T1, k]

        fn = pl.pallas_call(
            kern,
            grid=(Bp // TB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((12, L, TB), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((26, L, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((12, L, TB), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((12, L, Bp), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((6, 12, L, TB), jnp.uint32)],
            interpret=_interpret(),
            compiler_params=_CPARAMS,
        )
        self._cache[key] = fn
        return fn

    # -- public (standard layout, jit-composable) --------------------------

    def _pick_tb(self, B, cap):
        TB = max(128, min(cap, -(-B // 128) * 128))
        Bp = -(-B // TB) * TB
        return TB, Bp

    def _pad(self, arr, Bp):
        B = arr.shape[0]
        if B == Bp:
            return arr
        reps = jnp.broadcast_to(arr[:1], (Bp - B,) + arr.shape[1:])
        return jnp.concatenate([arr, reps], axis=0)

    def miller(self, p_aff, q_aff):
        """Batched Miller loop f_{|x|,Q}(P). p_aff: ((B, L), (B, L));
        q_aff: ((B, 2, L), (B, 2, L)). Returns (B, 12, L)."""
        xP, yP = p_aff
        xQ, yQ = q_aff
        B = xP.shape[0]
        TB, Bp = self._pick_tb(B, self.block)
        ins = [self._pad(xP, Bp).T, self._pad(yP, Bp).T,
               self._pad(xQ[:, 0], Bp).T, self._pad(xQ[:, 1], Bp).T,
               self._pad(yQ[:, 0], Bp).T, self._pad(yQ[:, 1], Bp).T]
        fn = self._miller_fn(Bp, TB)
        out = fn(self._mbits, *ins, self._consts)
        return jnp.transpose(out, (2, 0, 1))[:B]

    def final_exp(self, f):
        """(B, 12, L) -> (B, 12, L)."""
        squeeze = f.ndim == 2
        if squeeze:
            f = f[None]
        B = f.shape[0]
        TB, Bp = self._pick_tb(B, self.fe_block)
        fin = jnp.transpose(self._pad(f, Bp), (1, 2, 0))
        fn = self._final_exp_fn(Bp, TB)
        out = fn(self._fbits, self._prog, fin, self._consts)
        res = jnp.transpose(out, (2, 0, 1))[:B]
        return res[0] if squeeze else res

    def pairing(self, p_aff, q_aff):
        return self.final_exp(self.miller(p_aff, q_aff))

    def multi_pairing(self, p_aff, q_aff, skip_mask=None):
        """prod e(P_i, Q_i): batched Miller, skip-select, log-tree product
        (tiny XLA ops), ONE final exp at batch 1."""
        fp12 = self.fp12
        fs = self.miller(p_aff, q_aff)
        if skip_mask is not None:
            fs = fp12.cselect(skip_mask, fp12.broadcast_one(fs.shape[:-2]),
                              fs)
        while fs.shape[0] > 1:
            n = fs.shape[0]
            h = n // 2
            head = fp12.mul(fs[:h], fs[h:2 * h])
            fs = (jnp.concatenate([head, fs[2 * h:]], axis=0)
                  if n % 2 else head)
        return self.final_exp(fs[0])

    def pairing_check(self, p_aff, q_aff, skip_mask=None):
        gt = self.multi_pairing(p_aff, q_aff, skip_mask)
        return self.fp12.eq(gt, self.fp12.broadcast_one(()))


@functools.lru_cache(maxsize=None)
def get_pallas_pairing(block: int = 512) -> PallasPairing:
    return PallasPairing(block=block)
