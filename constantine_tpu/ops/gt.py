"""GT (pairing target group) operations: subgroup check, exponentiation,
multi-exponentiation — batched.

Re-design of the reference's GT stack
(constantine/math/pairings/gt_exponentiations.nim CT exponentiation,
gt_exponentiations_vartime.nim, gt_multiexp.nim:117- bucketed multiexp
over torus-projective T2 coordinates, gt_multiexp_parallel.nim,
gt_subgroup_checks.nim):

* GT = cyclotomic subgroup of Fp12* of order r. Inversion is conjugation
  (free), so signed-digit recodings come at no cost — exactly like EC.
* exponentiation: constant-time square-and-multiply over the cyclotomic
  group, batched over elements; the lane-wise select is the `secretLookup`
  analogue.
* multiexp: the SAME dense Pippenger machinery as the EC MSM (ops/msm.py)
  via a group adapter. DEFAULT path: torus-compressed T2 coordinates
  (T2Group below — the analogue of the reference's gt_prj.nim +
  gt_multiexp.nim:117): a cyclotomic g = g0 + g1*w (norm g0^2 - v*g1^2
  = 1) compresses to the single Fp6 ratio c = (1 + g0)/g1, g recovers as
  (c + w)/(c - w). Torus-projective pairs (n, d) with c = n/d multiply as
  (n1*n2 + v*d1*d2, n1*d2 + n2*d1); a MIXED mul against an affine c2
  costs 2 Fp6 muls vs 3 for a full Fp12 mul (and affine bucket entries
  are HALF the bytes), so bucket accumulation runs at 2/3 the
  multiplication count and half the gather traffic. The identity is any
  (n, 0) — intermediate identities (g and g^-1 colliding in a bucket)
  need no special-casing; only identity INPUTS are masked (their scalars
  zeroed) before compression. CTT_GT_TORUS=0 falls back to the dense
  Fp12 adapter.

Subgroup check: g^r == 1 via the fast Frobenius identity where available
(GT membership: g^(p^4 - p^2 + 1) == 1 and easy-part structure), else full
exponentiation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as lb


class GTGroup:
    """Adapter exposing the cyclotomic subgroup of Fp12 with an EC-group
    interface, so ops/msm.py Pippenger runs unchanged over GT."""

    def __init__(self, pairing):
        self.pr = pairing
        self.fp12 = pairing.fp12
        self.F = _ScalarShim(pairing.fp12)
        self.name = f"GT[{pairing.ctx.name}]"

    # -- group interface (points are 1-tuples holding the Fp12 element) ----

    def infinity(self, batch_shape=()):
        return (self.fp12.broadcast_one(batch_shape),)

    def from_affine(self, xy, inf_mask=None):
        (f,) = xy if isinstance(xy, tuple) and len(xy) == 1 else (xy,)
        if inf_mask is not None:
            one = self.fp12.broadcast_one(f.shape[:-2])
            f = self.fp12.cselect(inf_mask, one, f)
        return (f,)

    def to_affine(self, P):
        (f,) = P
        return (f,), self.is_inf(P)

    def is_inf(self, P):
        one = self.fp12.broadcast_one(P[0].shape[:-2])
        return self.fp12.eq(P[0], one)

    def add(self, P, Q):
        return (self.fp12.mul(P[0], Q[0]),)

    def madd(self, P, Q_aff, q_inf=None):
        out = (self.fp12.mul(P[0], Q_aff[0]),)
        if q_inf is not None:
            out = self.select(q_inf, P, out)
        return out

    def double(self, P):
        return (self.pr.cyclotomic_square(P[0]),)

    def neg(self, P):
        return (self.pr.cyclotomic_inv(P[0]),)

    def cneg(self, cond, P):
        return (self.fp12.cselect(cond, self.pr.cyclotomic_inv(P[0]), P[0]),)

    def aff_cneg(self, cond, xy):
        (f,) = xy
        return (self.fp12.cselect(cond, self.pr.cyclotomic_inv(f), f),)

    def select(self, cond, P, Q):
        return (self.fp12.cselect(cond, P[0], Q[0]),)

    def eq(self, P, Q):
        return self.fp12.eq(P[0], Q[0])

    # -- exponentiation ------------------------------------------------------

    def exp(self, exponent_limbs, f, exp_bits: int = None):
        """g^k batched, constant-time square-and-multiply
        (gt_exponentiations.nim analogue). exponent_limbs: (..., Ls)
        canonical 16-bit limbs; f: (..., 12, L) GT elements."""
        fp12 = self.fp12
        nbits = exp_bits or exponent_limbs.shape[-1] * 16

        def body(acc, i):
            limb = jax.lax.dynamic_index_in_dim(
                exponent_limbs, i >> 4, axis=-1, keepdims=False)
            bit = ((limb >> (i & 15)) & 1).astype(jnp.bool_)
            acc = self.pr.cyclotomic_square(acc)
            acc2 = fp12.mul(acc, f)
            return fp12.cselect(bit, acc2, acc), None

        bits_desc = jnp.arange(nbits - 1, -1, -1, dtype=jnp.int32)
        init = fp12.broadcast_one(f.shape[:-2])
        acc, _ = jax.lax.scan(body, init, bits_desc)
        return acc

    def multiexp(self, fs, exponents_limbs, c: int = None,
                 exp_bits: int = None, torus: bool = None):
        """prod_i fs[i]^k_i via the shared Pippenger (gt_multiexp.nim:117
        analogue). fs: (N, 12, L); returns a batchless GT element.

        Runs over torus-projective T2 coordinates by default (2 Fp6 muls
        per bucket accumulation instead of 3, gt_prj.nim analogue);
        torus=False or CTT_GT_TORUS=0 keeps the dense Fp12 adapter."""
        import os
        if torus is None:
            torus = os.environ.get("CTT_GT_TORUS", "1") != "0"
        if torus:
            if not hasattr(self, "_t2"):
                self._t2 = T2Group(self.pr)
            return self._t2.multiexp(fs, exponents_limbs, c=c,
                                     exp_bits=exp_bits)
        from .msm import msm
        out = msm(self, (fs,), exponents_limbs, c=c,
                  scalar_bits=exp_bits)
        return out[0]

    def is_in_subgroup(self, f):
        """GT membership (gt_subgroup_checks.nim): cyclotomic subgroup
        check f^(p^4-p^2+1) == 1 via Frobenius (f^(p^4) * f == f^(p^2)),
        then order check via the curve family identity (f^r == 1 given
        easy-part preconditions is implied for pairing outputs; we do the
        full r-exponentiation for untrusted inputs)."""
        fp12 = self.fp12
        p4 = self.pr.frobenius(self.pr.frobenius(f, 2), 2)
        p2 = self.pr.frobenius(f, 2)
        cyclo_ok = fp12.eq(fp12.mul(p4, f), p2)
        ctx = self.pr.ctx
        r_limbs = lb.int_to_limbs(ctx.r, ctx.fr.L)
        n = f.shape[0] if f.ndim == 3 else 1
        rl = jnp.asarray(np.tile(r_limbs, (n, 1)))
        fr = self.exp(rl, f if f.ndim == 3 else f[None],
                      exp_bits=ctx.r.bit_length())
        one = fp12.broadcast_one((n,))
        order_ok = fp12.eq(fr, one)
        return cyclo_ok & (order_ok if f.ndim == 3 else order_ok[0])


class T2Group:
    """Torus-projective GT multiexp group over T2(Fp6).

    Re-design of the reference's compressed GT arithmetic
    (constantine/math/pairings/gt_prj.nim T2Prj/T2Aff coordinates,
    gt_multiexp.nim:117 multiexp over them) for the shared dense
    Pippenger (ops/msm.py):

    * affine element: c in Fp6 with g = (c + w)/(c - w), c = (1+g0)/g1
      for cyclotomic g = g0 + g1*w (Fp12 = Fp6[w]/(w^2 - v));
    * projective pair (n, d) ~ c = n/d. Identity (g = 1) is ANY (n, 0),
      so bucket collisions of g and g^-1 resolve without special cases:
      (n,d)*( -n,d) = (-(n^2 - v d^2), 0);
    * group law (mul in GT):
        full:  (n1 n2 + v d1 d2,  n1 d2 + n2 d1)        3 Fp6 muls
        mixed: (n1 c2 + v d1,     n1 + c2 d1)           2 Fp6 muls
        square:(n^2 + v d^2,      2 n d)                2 sq + 1 mul
    * inversion (= conjugation = torus negation): (n, d) -> (-n, d).

    Only identity INPUTS need masking (c undefined): multiexp zeroes
    their scalars — g^k = 1 contributes nothing.
    """

    def __init__(self, pairing):
        self.pr = pairing
        self.fp12 = pairing.fp12
        self.fp6 = pairing.fp12.base
        self.F = _ScalarShim(self.fp6)
        self.name = f"T2[{pairing.ctx.name}]"
        self.a_int = None                 # not a Weierstrass curve
        self._mul_v = self.fp12.nr_mul    # x -> v * x in Fp6

    # -- compression ---------------------------------------------------------

    def compress(self, f):
        """(.., 12, L) cyclotomic Fp12 -> (c (.., 6, L), is_identity)."""
        g0, g1 = self.fp12.split(f)
        ident = self.fp6.is_zero(g1)
        one6 = self.fp6.broadcast_one(g1.shape[:-2])
        safe = self.fp6.cselect(ident, one6, g1)
        inv = self.fp6.batch_inv(safe) if f.ndim > 2 else self.fp6.inv(safe)
        c = self.fp6.mul(self.fp6.add(one6, g0), inv)
        return c, ident

    def decompress(self, P):
        """(n, d) -> Fp12 element (c + w)/(c - w) = (n + d w)/(n - d w)."""
        n, d = P
        num = self.fp12.join((n, d))
        den = self.fp12.join((n, self.fp6.neg(d)))
        return self.fp12.mul(num, self.fp12.inv(den))

    # -- group interface (points are (n, d) pairs of Fp6 elements) ----------

    def infinity(self, batch_shape=()):
        return (self.fp6.broadcast_one(batch_shape),
                self.fp6.broadcast_zero(batch_shape))

    def from_affine(self, xy, inf_mask=None):
        (c,) = xy if isinstance(xy, tuple) and len(xy) == 1 else (xy,)
        one = self.fp6.broadcast_one(c.shape[:-2])
        d = one
        if inf_mask is not None:
            d = self.fp6.cselect(inf_mask, self.fp6.broadcast_zero(
                c.shape[:-2]), d)
            c = self.fp6.cselect(inf_mask, one, c)
        return (c, d)

    def to_affine(self, P):
        n, d = P
        inf = self.fp6.is_zero(d)
        one = self.fp6.broadcast_one(d.shape[:-2])
        safe = self.fp6.cselect(inf, one, d)
        inv = self.fp6.batch_inv(safe) if n.ndim > 2 else self.fp6.inv(safe)
        return (self.fp6.mul(n, inv),), inf

    def is_inf(self, P):
        return self.fp6.is_zero(P[1])

    def add(self, P, Q):
        n1, d1 = P
        n2, d2 = Q
        n3 = self.fp6.add(self.fp6.mul(n1, n2),
                          self._mul_v(self.fp6.mul(d1, d2)))
        d3 = self.fp6.add(self.fp6.mul(n1, d2), self.fp6.mul(n2, d1))
        return (n3, d3)

    def madd(self, P, Q_aff, q_inf=None):
        n1, d1 = P
        (c2,) = Q_aff
        n3 = self.fp6.add(self.fp6.mul(n1, c2), self._mul_v(d1))
        d3 = self.fp6.add(n1, self.fp6.mul(c2, d1))
        out = (n3, d3)
        if q_inf is not None:
            out = self.select(q_inf, P, out)
        return out

    def double(self, P):
        n, d = P
        n3 = self.fp6.add(self.fp6.square(n), self._mul_v(self.fp6.square(d)))
        nd = self.fp6.mul(n, d)
        return (n3, self.fp6.add(nd, nd))

    def neg(self, P):
        return (self.fp6.neg(P[0]), P[1])

    def cneg(self, cond, P):
        return (self.fp6.cselect(cond, self.fp6.neg(P[0]), P[0]), P[1])

    def aff_cneg(self, cond, xy):
        (c,) = xy
        return (self.fp6.cselect(cond, self.fp6.neg(c), c),)

    def select(self, cond, P, Q):
        return (self.fp6.cselect(cond, P[0], Q[0]),
                self.fp6.cselect(cond, P[1], Q[1]))

    def eq(self, P, Q):
        lhs = self.fp6.mul(P[0], Q[1])
        rhs = self.fp6.mul(Q[0], P[1])
        both_inf = self.fp6.is_zero(P[1]) & self.fp6.is_zero(Q[1])
        return self.fp6.eq(lhs, rhs) | both_inf

    # -- multiexp ------------------------------------------------------------

    def multiexp(self, fs, exponents_limbs, c: int = None,
                 exp_bits: int = None):
        """prod_i fs[i]^k_i over T2; fs (N, 12, L) cyclotomic elements."""
        from .msm import msm
        caff, ident = self.compress(fs)
        ks = jnp.where(ident[..., None], jnp.uint32(0),
                       exponents_limbs.astype(jnp.uint32))
        out = msm(self, (caff,), ks, c=c, scalar_bits=exp_bits)
        return self.decompress(out)


class _ScalarShim:
    """Field-facade over Fp12 elements (shape (..., 12, L)) so the generic
    MSM helpers can pad/zero/select GT 'coordinates'."""

    deg = 12  # mark as tower-like: batch shape excludes last TWO axes

    def __init__(self, fp12):
        self._f = fp12
        self.L = fp12.L if hasattr(fp12, "L") else None

    def broadcast_zero(self, shape):
        return self._f.broadcast_zero(shape)

    def cselect(self, cond, a, b):
        return self._f.cselect(cond, a, b)

    def neg(self, a):  # only used via aff_cneg, which GTGroup overrides
        raise NotImplementedError

    def is_zero(self, a):
        return self._f.is_zero(a)


@functools.lru_cache(maxsize=None)
def get_gt(curve_name: str = "BLS12_381") -> GTGroup:
    from .pairing import get_pairing
    return GTGroup(get_pairing(curve_name))
