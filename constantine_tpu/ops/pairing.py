"""Optimal ate pairings (BLS12 + BN families) — batched, TPU-native.

Re-design of the reference's pairing stack:
* line evaluation + Miller loop: math/pairings/lines_eval.nim:231-281 (fused
  double/add-and-eval), miller_loops.nim:42-286;
* final exponentiation: pairings_bls12.nim:100 / pairings_bn.nim (hard
  parts), cyclotomic_subgroups.nim:38-377 (easy part);
* API: pairings_generic.nim:19-121 (pairing / pairing_check / millerLoop /
  finalExp), multi-pairing via shared loop structure
  (miller_accumulators.nim).

Design notes (TPU):
- G2 runs in homogeneous projective coordinates; each Miller step is a fused
  batched double(+line) / add(+line). Lines are scaled by arbitrary Fp2
  factors (killed by the easy part of the final exponentiation), which keeps
  every coefficient polynomial in (X, Y, Z) — no inversions.
- Line sparsity depends on the twist (derivation in docs/pairing.md):
    M-twist (BLS12-381):  l = xi*yP*sA + sC w^3 + xP*sB w^5
    D-twist (BN254):      l = yP*sA + xP*sB w   + sC w^3
  with, for doubling:  sA = 2YZ^2, sB = -3X^2 Z, sC = 3X^3 - 2Y^2 Z
  and for addition:    sA = lam,   sB = -theta,  sC = theta xQ - lam yQ
  (theta = Y - yQ Z, lam = X - xQ Z).
- BLS12 Miller loop is unrolled over the STATIC bits of |x| as zero-run
  lax.scan segments (x is sparse); BN uses a masked-add scan over the bits
  of 6u+2 (dense) plus the two Frobenius correction steps.
- Batch axis = pairs, padded to power-of-two buckets so protocol flows share
  compiled pipelines; pairing_check multiplies the batched Miller outputs
  (log-depth) and runs ONE final exponentiation.
- Hard-part exponent identities are asserted with python ints at build time.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .towers import build_tower
from ..utils import refmath as rm


class PairingBase:
    """Shared tower/Frobenius/line machinery for sextic-twist pairings."""

    def __init__(self, curve_name: str):
        from ..named.precompute import get_curve
        self.ctx = get_curve(curve_name)
        self.fp2, self.fp6, self.fp12 = build_tower(curve_name)
        self.fp = self.ctx.fp
        self.twist = self.ctx.params.twist_kind
        p = self.ctx.p

        nr = self.ctx.params.fp2_nonresidue
        xi = self.ctx.params.fp6_nonresidue
        assert (p - 1) % 6 == 0
        self._nr, self._xi = nr, xi

        def xi_pow(e):
            out = (1, 0)
            b = xi
            while e:
                if e & 1:
                    out = rm.fp2_mul(out, b, nr, p)
                b = rm.fp2_mul(b, b, nr, p)
                e >>= 1
            return out
        self._xi_pow = xi_pow

        g1 = [xi_pow(k * (p - 1) // 6) for k in range(6)]
        g2 = [xi_pow(k * (p * p - 1) // 6) for k in range(6)]
        g3 = [xi_pow(k * (p**3 - 1) // 6) for k in range(6)]
        wdeg = [0, 2, 4, 1, 3, 5]
        self.gamma1 = np.stack([self.fp2.encode(list(g1[k])) for k in wdeg])
        self.gamma2 = np.stack([self.fp2.encode(list(g2[k])) for k in wdeg])
        self.gamma3 = np.stack([self.fp2.encode(list(g3[k])) for k in wdeg])
        self._g1_raw = g1  # w-degree-indexed host values (for psi maps)

        bp = self.ctx.g2_b()
        self.b2_enc = self.fp2.encode([bp[0], bp[1]])  # twist b' constant

        self.miller_loop = jax.jit(self.miller_loop)
        self.final_exp = jax.jit(self.final_exp)

    # ------------------------------------------------------------------
    # tower helpers
    # ------------------------------------------------------------------

    def _line_to_fp12(self, lA, lB, lC):
        """Assemble the sparse line into a dense Fp12 element.
        Coefficient order has w-degrees (0, 2, 4, 1, 3, 5):
        slots 0:2=w^0, 6:8=w^1, 8:10=w^3, 10:12=w^5.
        M-twist: (w^0, w^3, w^5) = (lA, lC, lB);
        D-twist: (w^0, w^1, w^3) = (lA, lB, lC)."""
        z = jnp.zeros_like(lA)
        if self.twist == "M":
            return jnp.concatenate([lA, z, z, z, lC, lB], axis=-2)
        return jnp.concatenate([lA, z, z, lB, lC, z], axis=-2)

    def _scalar_mul_fp2(self, s, v):
        """Multiply Fp2 element v (..., 2, L) by Fp scalar s (..., L)."""
        return self.fp.mul(v, s[..., None, :])

    def frobenius(self, f, power: int = 1):
        """f^(p^power) for power in {1, 2, 3}. Componentwise conj (odd
        powers) + gamma multiplication (endomorphisms/frobenius.nim:39-109
        analogue)."""
        fp2 = self.fp2
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

    def cyclotomic_square(self, f):
        """Granger-Scott 2009 cyclotomic squaring (~2x a full Fp12 square):
        three disjoint Fp4 squarings + cheap linear recombination
        (cyclotomic_square_quad_over_cube, cyclotomic_subgroups.nim:277-353).
        Input MUST be unitary (in the cyclotomic subgroup — all call sites
        are post-easy-part)."""
        fp2 = self.fp2
        b = [f[..., 2 * i:2 * i + 2, :] for i in range(6)]

        def sq4(x, y):
            # (x + yV)^2 in Fp4 = Fp2[V]/(V^2 - xi)
            xx = fp2.square(x)
            yy = fp2.square(y)
            c0 = fp2.add(xx, fp2.mul_by_xi(yy))
            c1 = fp2.sub(fp2.sub(fp2.square(fp2.add(x, y)), xx), yy)
            return c0, c1

        v0 = sq4(b[0], b[4])
        v1 = sq4(b[3], b[2])
        v2 = sq4(b[1], b[5])

        def m32(v, bb):                       # 3v - 2bb
            t = fp2.sub(v, bb)
            return fp2.add(fp2.add(t, t), v)

        def p32(v, bb):                       # 3v + 2bb
            t = fp2.add(v, bb)
            return fp2.add(fp2.add(t, t), v)

        return jnp.concatenate([
            m32(v0[0], b[0]),                 # b0 = 3v0.c0 - 2b0
            m32(v1[0], b[1]),                 # b1 = 3v1.c0 - 2b1
            m32(v2[0], b[2]),                 # b2 = 3v2.c0 - 2b2
            p32(fp2.mul_by_xi(v2[1]), b[3]),  # b3 = 3 xi v2.c1 + 2b3
            p32(v0[1], b[4]),                 # b4 = 3v0.c1 + 2b4
            p32(v1[1], b[5]),                 # b5 = 3v1.c1 + 2b5
        ], axis=-2)

    # ------------------------------------------------------------------
    # fused Miller steps
    # ------------------------------------------------------------------

    def _emit_line(self, sA, sB, sC, xP, yP):
        if self.twist == "M":
            lA = self._scalar_mul_fp2(yP, self.fp2.mul_by_xi(sA))
        else:
            lA = self._scalar_mul_fp2(yP, sA)
        lB = self._scalar_mul_fp2(xP, sB)
        return self._line_to_fp12(lA, lB, sC)

    def _dbl_step(self, T, xP, yP):
        """Projective G2 doubling + tangent line at untwisted T eval'd at P
        (line_eval_fused_double analogue, lines_eval.nim:231)."""
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
        XX = fp2.square(X)
        sA = fp2.mul(H, Z)                         # 2YZ^2
        sC = fp2.sub(fp2.mul(fp2.mul_small(XX, 3), X),
                     fp2.mul(fp2.add(B, B), Z))    # 3X^3 - 2Y^2 Z
        sB = fp2.neg(fp2.mul(fp2.mul_small(XX, 3), Z))  # -3X^2 Z
        return (X3, Y3, Z3), self._emit_line(sA, sB, sC, xP, yP)

    def _add_step(self, T, Q, xP, yP):
        """Mixed add T + Q (Q affine in Fp2) + chord line eval'd at P
        (line_eval_fused_add analogue, lines_eval.nim:281)."""
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
        sA = lam
        sC = fp2.sub(fp2.mul(theta, xQ), fp2.mul(lam, yQ))
        sB = fp2.neg(theta)
        return (X3, Y3, Z3), self._emit_line(sA, sB, sC, xP, yP)

    # ------------------------------------------------------------------
    # shared public API
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

    def _pallas_engine(self):
        """Fused Pallas pairing kernels (ops/pallas_pairing.py) when
        available for this curve/backend: BLS12-381, accelerator backends
        (the XLA tower path stays the CPU/test implementation and the
        generic-curve fallback). CTT_PALLAS_PAIR_OFF=1 disables."""
        import os
        if os.environ.get("CTT_PALLAS_PAIR_OFF") == "1":
            return None
        if getattr(self.ctx, "name", None) != "BLS12_381":
            return None
        if jax.default_backend() == "cpu" \
                and os.environ.get("CTT_PALLAS_PAIRING") != "1":
            return None
        from .pallas_pairing import get_pallas_pairing
        return get_pallas_pairing()

    def pairing(self, p_aff, q_aff):
        """e(P, Q) batched (pairings_generic.nim:19)."""
        pp = self._pallas_engine()
        if pp is not None:
            return pp.pairing(p_aff, q_aff)
        p_aff, q_aff, skip, n = self._pad_pairs(p_aff, q_aff, None)
        return self.final_exp(self.miller_loop(p_aff, q_aff))[:n]

    def multi_pairing(self, p_aff, q_aff, skip_mask=None):
        """prod_i e(P_i, Q_i): batched Miller, log-tree product, ONE final
        exp (pairings_bls12.nim:155-180 multi-pairing analogue).
        skip_mask: (B,) True entries contribute the identity."""
        pp = self._pallas_engine()
        if pp is not None:
            return pp.multi_pairing(p_aff, q_aff, skip_mask)
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

    # -- final exp easy part (shared) ----------------------------------

    def _final_exp_easy(self, f):
        fp12 = self.fp12
        finv = fp12.inv(f)
        f = fp12.mul(self.conj12(f), finv)        # f^(p^6-1)
        return fp12.mul(self.frobenius(f, 2), f)  # ^(p^2+1)

    def _pow_u_cyclo(self, f, u_abs: int, u_neg: bool):
        """f^u in the cyclotomic subgroup (conj at the end if u < 0)."""
        fp12 = self.fp12
        bits = np.asarray([int(b) for b in bin(u_abs)[3:]], dtype=np.int32)

        def body(acc, bit):
            acc = self.cyclotomic_square(acc)
            acc_mul = fp12.mul(acc, f)
            acc = fp12.cselect((bit == 1) & jnp.ones(acc.shape[:-2], bool),
                               acc_mul, acc)
            return acc, None

        acc, _ = jax.lax.scan(body, f, jnp.asarray(bits))
        if u_neg:
            acc = self.conj12(acc)
        return acc


class BLSPairing(PairingBase):
    """BLS12 family: Miller loop over |x|, fast hard part."""

    def __init__(self, curve_name: str = "BLS12_381"):
        from ..named.precompute import get_curve
        ctx = get_curve(curve_name)
        assert ctx.params.family == "bls12"
        p, x, r = ctx.p, ctx.params.x_param, ctx.r
        # Hard part identity (verified, not trusted). The standard
        # decomposition computes f^(3h) with h = (p^4-p^2+1)/r — the cube of
        # the reduced pairing; gcd(3, r) = 1 so all checks are unaffected
        # (same choice as the reference, pairings_bls12.nim:100).
        assert (3 * ((p**4 - p**2 + 1) // r) ==
                (x - 1) ** 2 * (x + p) * (x**2 + p**2 - 1) + 3), \
            "BLS12 final-exp decomposition"
        self.x_abs = abs(x)
        self.x_neg = x < 0
        self.x_bits = [int(b) for b in bin(self.x_abs)[2:]]  # MSB first
        super().__init__(curve_name)

    def miller_loop(self, p_aff, q_aff):
        """Batched Miller loop f_{|x|, Q}(P); conjugated for x < 0."""
        fp12 = self.fp12
        xP, yP = p_aff
        xQ, yQ = q_aff
        batch = xP.shape[:-1]
        T = (xQ, yQ, self.fp2.broadcast_one(batch))
        f = fp12.broadcast_one(batch)

        bits = self.x_bits
        i = 1
        while i <= len(bits) - 1:
            run = 0
            while i + run <= len(bits) - 1 and bits[i + run] == 0:
                run += 1
            if run > 0:  # zero-run: doubling-only steps, single traced body
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
        if self.x_neg:
            f = self.conj12(f)
        return f

    def _pow_x_cyclo(self, f):
        return self._pow_u_cyclo(f, self.x_abs, self.x_neg)

    def _pow_x_minus_1_cyclo(self, f):
        return self.fp12.mul(self._pow_x_cyclo(f), self.conj12(f))

    def final_exp(self, f):
        """f^((p^12-1)/r · 3) via (x-1)^2 (x+p) (x^2+p^2-1) + 3."""
        fp12 = self.fp12
        f = self._final_exp_easy(f)
        t1 = self._pow_x_minus_1_cyclo(f)
        t1 = self._pow_x_minus_1_cyclo(t1)        # f^((x-1)^2)
        t2 = fp12.mul(self._pow_x_cyclo(t1), self.frobenius(t1, 1))  # ^(x+p)
        t3 = fp12.mul(
            fp12.mul(self._pow_x_cyclo(self._pow_x_cyclo(t2)),
                     self.frobenius(t2, 2)),
            self.conj12(t2))                      # ^(x^2 + p^2 - 1)
        return fp12.mul(t3, fp12.mul(fp12.square(f), f))  # * f^3


class BNPairing(PairingBase):
    """BN family (BN254): Miller loop over 6u+2 + Frobenius line steps,
    generic (exponent-verified) hard part (pairings_bn.nim analogue)."""

    def __init__(self, curve_name: str = "BN254_Snarks"):
        from ..named.precompute import get_curve
        ctx = get_curve(curve_name)
        assert ctx.params.family == "bn"
        u = ctx.params.x_param
        self.loop = 6 * u + 2
        # negative ate parameter (e.g. BN254_Nogami): run the loop over
        # |6u+2|, then f <- conj(f), T <- -T before the Frobenius add
        # steps (miller_loops.nim negative-param handling)
        self.loop_neg = self.loop < 0
        self.loop_bits = np.asarray(
            [int(b) for b in bin(abs(self.loop))[3:]], dtype=np.int32)
        p, r = ctx.p, ctx.r
        assert (p**4 - p**2 + 1) % r == 0
        self.hard_exp = (p**4 - p**2 + 1) // r
        super().__init__(curve_name)
        # Frobenius-on-twist constants (D-twist): pi(x', y') =
        # (conj(x') xi^((p-1)/3), conj(y') xi^((p-1)/2))
        p1 = self._xi_pow((p - 1) // 3)
        p2 = self._xi_pow((p - 1) // 2)
        self.pi_x = self.fp2.encode(list(p1))
        self.pi_y = self.fp2.encode(list(p2))
        # pi^2 constants (no conj): xi^((p^2-1)/3), xi^((p^2-1)/2)
        q1 = self._xi_pow((p * p - 1) // 3)
        q2 = self._xi_pow((p * p - 1) // 2)
        self.pi2_x = self.fp2.encode(list(q1))
        self.pi2_y = self.fp2.encode(list(q2))

    def _pi(self, Q):
        """Frobenius endomorphism on affine twist points."""
        fp2 = self.fp2
        xQ, yQ = Q
        px = jnp.broadcast_to(jnp.asarray(self.pi_x), xQ.shape)
        py = jnp.broadcast_to(jnp.asarray(self.pi_y), yQ.shape)
        return (fp2.mul(fp2.conj(xQ), px), fp2.mul(fp2.conj(yQ), py))

    def _pi2(self, Q):
        fp2 = self.fp2
        xQ, yQ = Q
        px = jnp.broadcast_to(jnp.asarray(self.pi2_x), xQ.shape)
        py = jnp.broadcast_to(jnp.asarray(self.pi2_y), yQ.shape)
        return (fp2.mul(xQ, px), fp2.mul(yQ, py))

    def miller_loop(self, p_aff, q_aff):
        """f_{6u+2, Q}(P) · l_{[6u+2]Q, pi(Q)}(P) · l_{..., -pi^2(Q)}(P)."""
        fp12 = self.fp12
        fp2 = self.fp2
        xP, yP = p_aff
        xQ, yQ = q_aff
        batch = xP.shape[:-1]
        T = (xQ, yQ, fp2.broadcast_one(batch))
        f = fp12.broadcast_one(batch)

        def body(state, bit):
            f_, T_ = state
            f_ = fp12.square(f_)
            T_, l = self._dbl_step(T_, xP, yP)
            f_ = fp12.mul(f_, l)
            T_add, l_add = self._add_step(T_, (xQ, yQ), xP, yP)
            f_add = fp12.mul(f_, l_add)
            take = (bit == 1) & jnp.ones(batch, bool)
            f_ = fp12.cselect(take, f_add, f_)
            T_ = tuple(fp2.cselect(take, a, b) for a, b in zip(T_add, T_))
            return (f_, T_), None

        (f, T), _ = jax.lax.scan(body, (f, T), jnp.asarray(self.loop_bits))

        if self.loop_neg:
            f = self.conj12(f)
            T = (T[0], fp2.neg(T[1]), T[2])

        # Frobenius correction steps (miller_loops.nim BN :92 analogue)
        Q1 = self._pi((xQ, yQ))
        Q2 = self._pi2((xQ, yQ))
        nQ2 = (Q2[0], fp2.neg(Q2[1]))
        T, l = self._add_step(T, Q1, xP, yP)
        f = fp12.mul(f, l)
        T, l = self._add_step(T, nQ2, xP, yP)
        f = fp12.mul(f, l)
        return f

    def final_exp(self, f):
        """Easy part + generic square-and-multiply hard part (exponent
        verified at build; fast BN decomposition is a later optimization)."""
        f = self._final_exp_easy(f)
        return self.fp12.pow_const(f, self.hard_exp)


@functools.lru_cache(maxsize=None)
def get_pairing(curve_name: str = "BLS12_381"):
    from ..named.precompute import get_curve
    if curve_name == "BW6_761":
        from .pairing_bw6 import get_bw6_pairing
        return get_bw6_pairing()
    fam = get_curve(curve_name).params.family
    return BLSPairing(curve_name) if fam == "bls12" else BNPairing(curve_name)


class MillerAccumulator:
    """Streaming multi-pairing accumulator — API parity with the
    reference's MillerAccumulator (pairings/miller_accumulators.nim:71-147):
    ``update()`` queues (P, Q) pairs, ``handover()`` flushes the queue into
    a running Miller product every `batch` pairs, ``finish()`` returns the
    final-exponentiated product (or the raw Fp12 with final_exp=False).

    On TPU the batching motivation inverts: the queued pairs run as ONE
    batched Miller loop regardless of count, so `batch` only bounds peak
    device memory (default 64 pairs per flush vs the reference's 8, which
    was sized to CPU L1).
    """

    def __init__(self, pairing, batch: int = 64):
        self.pairing = pairing
        self.batch = batch
        self._queue_p = []
        self._queue_q = []
        self._acc = None            # running Fp12 product (Miller only)

    def update(self, p_aff, q_aff):
        """Queue one or more (P, Q) affine pairs (leading batch axis)."""
        self._queue_p.append(tuple(jnp.asarray(t) for t in p_aff))
        self._queue_q.append(tuple(jnp.asarray(t) for t in q_aff))
        n = sum(t[0].shape[0] for t in self._queue_p)
        if n >= self.batch:
            self.handover()

    def handover(self):
        """Flush queued pairs into the running Miller product."""
        if not self._queue_p:
            return
        pa = tuple(jnp.concatenate([q[k] for q in self._queue_p], axis=0)
                   for k in range(2))
        qa = tuple(jnp.concatenate([q[k] for q in self._queue_q], axis=0)
                   for k in range(2))
        self._queue_p, self._queue_q = [], []
        pr = self.pairing
        pa, qa, skip, _ = pr._pad_pairs(pa, qa, None)
        fs = pr.miller_loop(pa, qa)
        fs = pr.fp12.cselect(skip, pr.fp12.broadcast_one(fs.shape[:-2]), fs)
        while fs.shape[0] > 1:
            h = fs.shape[0] // 2
            head = pr.fp12.mul(fs[:h], fs[h:2 * h])
            fs = (jnp.concatenate([head, fs[2 * h:]], axis=0)
                  if fs.shape[0] % 2 else head)
        f = fs[0]
        self._acc = f if self._acc is None else pr.fp12.mul(self._acc, f)

    def finish(self, final_exp: bool = True):
        """Returns the accumulated product (after final exponentiation by
        default). None if nothing was accumulated."""
        self.handover()
        if self._acc is None:
            return None
        return self.pairing.final_exp(self._acc) if final_exp else self._acc

    def is_one(self):
        """Accumulated pairing product == 1? (pairing-check finish)."""
        gt = self.finish()
        fp12 = self.pairing.fp12
        return fp12.eq(gt, fp12.broadcast_one(()))
