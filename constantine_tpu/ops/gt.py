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
  via a group adapter — GT elements as "points" whose add = Fp12 mul,
  double = cyclotomic square, neg = conjugation. The reference's torus T2
  compression (gt_prj.nim) halves multiplication cost; here lane
  parallelism already saturates the VPU so we keep plain Fp12.

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
                 exp_bits: int = None):
        """prod_i fs[i]^k_i via the shared Pippenger (gt_multiexp.nim:117
        analogue). fs: (N, 12, L); returns a batchless GT element."""
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
