"""Optimal ate pairing for BLS12 curves — batched, TPU-native.

Re-design of the reference's pairing stack:
* line evaluation + Miller loop: math/pairings/lines_eval.nim:231-281 (fused
  double/add-and-eval), miller_loops.nim:42-286;
* final exponentiation: pairings_bls12.nim:100 (hard part),
  cyclotomic_subgroups.nim:38-377 (easy part, cyclotomic squaring);
* API: pairings_generic.nim:19-121 (pairing / pairing_check / millerLoop /
  finalExp), multi-pairing via shared loop structure
  (miller_accumulators.nim).

Design notes (TPU):
- G2 runs in homogeneous projective coordinates; each Miller step is a fused
  batched double(+line) / add(+line). Lines are scaled by arbitrary Fp2
  factors (killed by the easy part of the final exponentiation), which keeps
  every coefficient polynomial in (X, Y, Z) — no inversions.
- For the M-twist (w^6 = xi, untwist (x', y') -> (x'/w^2, y'/w^3)) the line
  through the untwisted points evaluated at P = (xP, yP) is
      l = xi*yP*s0  +  s3 * w^3  +  s5*xP * w^5        (coeffs in Fp2)
  doubling:  s0 = 2YZ^2,  s3 = 3X^3 - 2Y^2 Z,  s5 = -3X^2 Z
  addition:  s0 = lam,    s3 = theta*xQ - lam*yQ,  s5 = -theta
  with theta = Y - yQ Z, lam = X - xQ Z (derivation in docs/pairing.md).
- The Miller loop is unrolled over the STATIC bits of |x| as zero-run
  lax.scan segments + explicit add steps (x has Hamming weight 6 for
  BLS12-381), so the trace stays small and no work is wasted on 0-bits.
- Batch axis = pairs; pairing_check multiplies the batched Miller outputs
  (log-depth) and runs ONE final exponentiation.
- The BLS12 hard-part identity (p^4-p^2+1)/r = (x-1)^2 (x+p) (x^2+p^2-1) + 3
  is asserted with python ints at build time.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .towers import build_tower
from ..utils import refmath as rm


class BLSPairing:
    def __init__(self, curve_name: str = "BLS12_381"):
        from ..named.precompute import get_curve
        self.ctx = get_curve(curve_name)
        assert self.ctx.params.family == "bls12"
        assert self.ctx.params.twist_kind == "M"
        self.fp2, self.fp6, self.fp12 = build_tower(curve_name)
        self.fp = self.ctx.fp
        p, x = self.ctx.p, self.ctx.params.x_param
        r = self.ctx.r
        # hard part identity (verified, not trusted). Note the standard
        # decomposition computes f^(3h) with h = (p^4-p^2+1)/r — the cube of
        # the reduced pairing. gcd(3, r) = 1 so bilinearity/non-degeneracy
        # and all product-==-1 checks are unaffected; this matches what
        # production BLS12-381 implementations (incl. the reference,
        # pairings_bls12.nim:100) output.
        assert (3 * ((p**4 - p**2 + 1) // r) ==
                (x - 1) ** 2 * (x + p) * (x**2 + p**2 - 1) + 3), \
            "BLS12 final-exp decomposition"
        self.x_abs = abs(x)
        self.x_neg = x < 0
        self.x_bits = [int(b) for b in bin(self.x_abs)[2:]]  # MSB first

        # Frobenius coefficients gamma1[k] = xi^(k*(p-1)/6) in Fp2,
        # gamma2[k] = xi^(k*(p^2-1)/6); w-degree order of our tower
        # coefficients is (0, 2, 4, 1, 3, 5).
        nr = self.ctx.params.fp2_nonresidue
        xi = self.ctx.params.fp6_nonresidue
        assert (p - 1) % 6 == 0

        def xi_pow(e):
            out = (1, 0)
            b = xi
            while e:
                if e & 1:
                    out = rm.fp2_mul(out, b, nr, p)
                b = rm.fp2_mul(b, b, nr, p)
                e >>= 1
            return out

        g1 = [xi_pow(k * (p - 1) // 6) for k in range(6)]
        g2 = [xi_pow(k * (p * p - 1) // 6) for k in range(6)]
        g3 = [xi_pow(k * (p**3 - 1) // 6) for k in range(6)]
        wdeg = [0, 2, 4, 1, 3, 5]
        self.gamma1 = np.stack([self.fp2.encode(list(g1[k])) for k in wdeg])
        self.gamma2 = np.stack([self.fp2.encode(list(g2[k])) for k in wdeg])
        self.gamma3 = np.stack([self.fp2.encode(list(g3[k])) for k in wdeg])
        for k in wdeg:
            assert g2[k][1] == 0, "gamma2 should be in Fp"

        bp = self.ctx.g2_b()
        self.b2_enc = self.fp2.encode([bp[0], bp[1]])  # twist b' constant

        self.miller_loop = jax.jit(self.miller_loop)
        self.final_exp = jax.jit(self.final_exp)

    # ------------------------------------------------------------------
    # tower helpers
    # ------------------------------------------------------------------

    def _line_to_fp12(self, l0, l3, l5):
        """Sparse line (w^0, w^3, w^5 coeffs in Fp2) -> dense Fp12.
        Tower coefficient order has w-degrees (0,2,4,1,3,5):
        w^0 -> slots 0:2, w^3 -> slots 8:10, w^5 -> slots 10:12."""
        z = jnp.zeros_like(l0)
        return jnp.concatenate([l0, z, z, z, l3, l5], axis=-2)

    def _scalar_mul_fp2(self, s, v):
        """Multiply Fp2 element v (..., 2, L) by Fp scalar s (..., L)."""
        return self.fp.mul(v, s[..., None, :])

    def frobenius(self, f, power: int = 1):
        """f^(p^power) for power in {1, 2, 3}. Componentwise conj (odd
        powers) + gamma multiplication (endomorphisms/frobenius.nim:39-109
        analogue)."""
        fp2, fp = self.fp2, self.fp
        comps = [f[..., 2 * i:2 * i + 2, :] for i in range(6)]
        gs = {1: self.gamma1, 2: self.gamma2, 3: self.gamma3}[power]
        out = []
        for k in range(6):
            c = comps[k]
            if power % 2 == 1:
                c = fp2.conj(c)
            g = jnp.broadcast_to(jnp.asarray(gs[k]), c.shape)
            out.append(fp2.mul(c, g))
        return jnp.concatenate(out, axis=-2)

    def conj12(self, f):
        """f^(p^6): negate the w-odd half (c1)."""
        c0 = f[..., :6, :]
        c1 = f[..., 6:, :]
        return jnp.concatenate([c0, self.fp.neg(c1)], axis=-2)

    def cyclotomic_inv(self, f):
        return self.conj12(f)

    # ------------------------------------------------------------------
    # Miller loop
    # ------------------------------------------------------------------

    def _dbl_step(self, T, xP, yP):
        """Projective G2 doubling + tangent line at untwisted T eval'd at P.
        Returns (T2, line_fp12). Analogue of line_eval_fused_double
        (lines_eval.nim:231)."""
        fp2 = self.fp2
        X, Y, Z = T
        b2 = jnp.broadcast_to(jnp.asarray(self.b2_enc), X.shape)
        B = fp2.square(Y)
        C = fp2.square(Z)
        E = fp2.mul_small(fp2.mul(b2, C), 3)       # 3 b' Z^2
        F3 = fp2.mul_small(E, 3)
        A = self.fp.div2(fp2.mul(X, Y))            # XY/2
        G = self.fp.div2(fp2.add(B, F3))           # (B+3E)/2
        H = fp2.sub(fp2.sub(fp2.square(fp2.add(Y, Z)), B), C)  # 2YZ
        X3 = fp2.mul(A, fp2.sub(B, F3))
        Y3 = fp2.sub(fp2.square(G), fp2.mul_small(fp2.square(E), 3))
        Z3 = fp2.mul(B, H)
        # line: s0 = 2YZ^2 = H*Z ; s3 = 3X^3 - 2Y^2 Z ; s5 = -3X^2 Z
        XX = fp2.square(X)
        s0 = fp2.mul(H, Z)
        s3 = fp2.sub(fp2.mul(fp2.mul_small(XX, 3), X),
                     fp2.mul(fp2.add(B, B), Z))
        s5 = fp2.neg(fp2.mul(fp2.mul_small(XX, 3), Z))
        l0 = self._scalar_mul_fp2(yP, self.fp2.mul_by_xi(s0))
        l3 = s3
        l5 = self._scalar_mul_fp2(xP, s5)
        return (X3, Y3, Z3), self._line_to_fp12(l0, l3, l5)

    def _add_step(self, T, Q, xP, yP):
        """Mixed add T + Q (Q affine in Fp2) + chord line eval'd at P.
        Analogue of line_eval_fused_add (lines_eval.nim:281)."""
        fp2 = self.fp2
        X, Y, Z = T
        xQ, yQ = Q
        theta = fp2.sub(Y, fp2.mul(yQ, Z))
        lam = fp2.sub(X, fp2.mul(xQ, Z))
        t2 = fp2.square(theta)
        l2 = fp2.square(lam)
        l3c = fp2.mul(l2, lam)
        H = fp2.add(fp2.sub(fp2.mul(t2, Z), fp2.mul_small(fp2.mul(l2, X), 2)),
                    l3c)
        X3 = fp2.mul(lam, H)
        Y3 = fp2.sub(fp2.mul(theta, fp2.sub(fp2.mul(l2, X), H)),
                     fp2.mul(Y, l3c))
        Z3 = fp2.mul(l3c, Z)
        s0 = lam
        s3 = fp2.sub(fp2.mul(theta, xQ), fp2.mul(lam, yQ))
        s5 = fp2.neg(theta)
        l0 = self._scalar_mul_fp2(yP, self.fp2.mul_by_xi(s0))
        l5 = self._scalar_mul_fp2(xP, s5)
        return (X3, Y3, Z3), self._line_to_fp12(l0, s3, l5)

    def miller_loop(self, p_aff, q_aff):
        """Batched Miller loop f_{|x|, Q}(P). p_aff = (xP, yP) (B, L) arrays
        (Montgomery); q_aff = (xQ, yQ) (B, 2, L). Returns (B, 12, L).
        For x < 0 the result is conjugated (standard BLS12 negative-x fix).
        """
        fp12 = self.fp12
        xP, yP = p_aff
        xQ, yQ = q_aff
        batch = xP.shape[:-1]
        one2 = self.fp2.broadcast_one(batch)
        T = (xQ, yQ, one2)
        f = fp12.broadcast_one(batch)

        bits = self.x_bits
        # segments of zero-runs between ones (bits[0] == 1 consumed by init)
        i = 1
        first = True
        while i <= len(bits) - 1 or first:
            # count run of steps until next 1-bit (inclusive scan structure:
            # every bit costs a dbl; 1-bits add an add-step)
            if i > len(bits) - 1:
                break
            run = 0
            while i + run <= len(bits) - 1 and bits[i + run] == 0:
                run += 1
            # `run` doubling-only steps via fori_loop (single traced body)
            if run > 0:
                def dbl_only(_, state):
                    f_, T_ = state
                    f_ = fp12.square(f_)
                    T_, l = self._dbl_step(T_, xP, yP)
                    return (fp12.mul(f_, l), T_)
                f, T = jax.lax.fori_loop(0, run, dbl_only, (f, T))
                i += run
            if i <= len(bits) - 1:  # 1-bit: dbl + add
                f = fp12.square(f)
                T, l = self._dbl_step(T, xP, yP)
                f = fp12.mul(f, l)
                T, l = self._add_step(T, (xQ, yQ), xP, yP)
                f = fp12.mul(f, l)
                i += 1
            first = False
        if self.x_neg:
            f = self.conj12(f)
        return f

    # ------------------------------------------------------------------
    # final exponentiation
    # ------------------------------------------------------------------

    def cyclotomic_square(self, f):
        """Plain Fp12 squaring for now; Karabina compressed squaring
        (cyclotomic_subgroups.nim:218-744) is a planned optimization."""
        return self.fp12.square(f)

    def _pow_x_cyclo(self, f):
        """f^x in the cyclotomic subgroup (x the curve parameter, negative
        for BLS12-381: conjugate at the end)."""
        fp12 = self.fp12
        bits = np.asarray(self.x_bits[1:], dtype=np.int32)

        def body(acc, bit):
            acc = self.cyclotomic_square(acc)
            acc_mul = fp12.mul(acc, f)
            acc = fp12.cselect((bit == 1) & jnp.ones(acc.shape[:-2], bool),
                               acc_mul, acc)
            return acc, None

        acc, _ = jax.lax.scan(body, f, jnp.asarray(bits))
        if self.x_neg:
            acc = self.conj12(acc)
        return acc

    def _pow_x_minus_1_cyclo(self, f):
        """f^(x-1) = f^x * f^-1 (cyclotomic inverse = conj)."""
        return self.fp12.mul(self._pow_x_cyclo(f), self.conj12(f))

    def final_exp(self, f):
        """f^((p^12-1)/r) (pairings_bls12.nim:100 analogue).

        easy part: f^(p^6-1) then ^(p^2+1);
        hard part via (x-1)^2 (x+p) (x^2+p^2-1) + 3."""
        fp12 = self.fp12
        # easy
        finv = fp12.inv(f)
        f = fp12.mul(self.conj12(f), finv)        # f^(p^6-1)
        f = fp12.mul(self.frobenius(f, 2), f)     # ^(p^2+1)
        # hard
        t1 = self._pow_x_minus_1_cyclo(f)
        t1 = self._pow_x_minus_1_cyclo(t1)        # f^((x-1)^2)
        t2 = fp12.mul(self._pow_x_cyclo(t1), self.frobenius(t1, 1))  # ^(x+p)
        t3 = fp12.mul(
            fp12.mul(self._pow_x_cyclo(self._pow_x_cyclo(t2)),
                     self.frobenius(t2, 2)),
            self.conj12(t2))                      # ^(x^2 + p^2 - 1)
        return fp12.mul(t3, fp12.mul(fp12.square(f), f))  # * f^3

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def _pad_pairs(self, p_aff, q_aff, skip_mask):
        """Pad the pair batch to a power-of-two bucket (min 4) so every
        protocol flow shares one compiled Miller/final-exp pipeline.
        Padding pairs are (G1gen, G2gen) with skip=True."""
        n = p_aff[0].shape[0]
        target = max(4, 1 << (n - 1).bit_length()) if n > 1 else 4
        if n == target:
            if skip_mask is None:
                skip_mask = jnp.zeros((n,), jnp.bool_)
            return p_aff, q_aff, skip_mask, n
        pad = target - n
        gx, gy = self.ctx.g1_gen
        g2x, g2y = self.ctx.g2_gen

        def padp(arr, g):
            fill = jnp.broadcast_to(g[0], (pad,) + g.shape[1:])
            return jnp.concatenate([arr, fill], axis=0)
        p_aff = (padp(p_aff[0], gx), padp(p_aff[1], gy))
        q_aff = (padp(q_aff[0], g2x), padp(q_aff[1], g2y))
        base = (skip_mask if skip_mask is not None
                else jnp.zeros((n,), jnp.bool_))
        skip_mask = jnp.concatenate([base, jnp.ones((pad,), jnp.bool_)])
        return p_aff, q_aff, skip_mask, n

    def pairing(self, p_aff, q_aff):
        """e(P, Q) batched (pairings_generic.nim:19)."""
        p_aff, q_aff, skip, n = self._pad_pairs(p_aff, q_aff, None)
        return self.final_exp(self.miller_loop(p_aff, q_aff))[:n]

    def multi_pairing(self, p_aff, q_aff, skip_mask=None):
        """prod_i e(P_i, Q_i): batched Miller, log-tree product, ONE final
        exp (the multi-pairing of pairings_bls12.nim:155-180).
        skip_mask: (B,) True entries contribute the identity (for points at
        infinity, matching the reference's infinity-skip)."""
        fp12 = self.fp12
        p_aff, q_aff, skip_mask, _ = self._pad_pairs(p_aff, q_aff, skip_mask)
        fs = self.miller_loop(p_aff, q_aff)        # (B, 12, L)
        fs = fp12.cselect(skip_mask, fp12.broadcast_one(fs.shape[:-2]), fs)
        while fs.shape[0] > 1:
            n = fs.shape[0]
            h = n // 2
            head = fp12.mul(fs[:h], fs[h:2 * h])
            fs = (jnp.concatenate([head, fs[2 * h:]], axis=0)
                  if n % 2 else head)
        return self.final_exp(fs[0])

    def pairing_check(self, p_aff, q_aff, skip_mask=None):
        """prod e(P_i, Q_i) == 1 (pairing_check, pairings_generic.nim:49)."""
        gt = self.multi_pairing(p_aff, q_aff, skip_mask)
        return self.fp12.eq(gt, self.fp12.broadcast_one(()))


@functools.lru_cache(maxsize=None)
def get_pairing(curve_name: str = "BLS12_381") -> BLSPairing:
    return BLSPairing(curve_name)
