"""Extension-field towers (Fp2, Fp6, Fp12) — batched, field-like.

TPU re-design of the reference's tower layer
(constantine/math/extension_fields/towers.nim:33-65 for the type structure,
:1341-1364 for the Karatsuba/Chung-Hasan arithmetic). Tower elements are flat
uint32 arrays of shape (..., k, L) where k is the total extension degree over
the prime field; sub-components are contiguous slices along axis -2, so all
LINEAR ops (add/sub/neg/select) delegate straight to the prime field's
limb kernels on the whole array — one fused vector op regardless of tower
height. Only multiplication/inversion recurse through the tower structure.

Every tower class implements the same "field-like" protocol as ops.field.Field
(add/sub/mul/square/neg/mul_small/cselect/is_zero/eq/broadcast_*/inv/
batch_inv), so ops.ec.ECGroup works unchanged over Fp2 (G2) or any layer.
"""

from __future__ import annotations

import functools
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as lb
from .field import Field


class ExtField:
    """Common machinery for quadratic/cubic extensions over a field-like."""

    arity: int = 0  # number of sub-components (2 or 3)

    def __init__(self, base, nonresidue_mul: Callable, name: str):
        self.base = base
        self.prime: Field = base.prime if isinstance(base, ExtField) else base
        self.sub_deg = base.deg if isinstance(base, ExtField) else 1
        self.deg = self.arity * self.sub_deg
        self.L = self.prime.L
        self.nr_mul = nonresidue_mul  # x -> xi * x  (x in base field)
        self.name = name
        for meth in ("add", "sub", "mul", "square", "neg", "double",
                     "inv", "batch_inv", "is_zero", "eq"):
            setattr(self, meth, jax.jit(getattr(self, meth)))
        self.mul_small = jax.jit(self.mul_small, static_argnums=(1,))
        self.pow_const = jax.jit(self.pow_const, static_argnums=(1, 2))

    # -- component access -------------------------------------------------

    def split(self, x):
        k = self.sub_deg
        return tuple(x[..., i * k:(i + 1) * k, :] if k > 1
                     else x[..., i, :] for i in range(self.arity))

    def join(self, comps):
        k = self.sub_deg
        if k > 1:
            return jnp.concatenate(comps, axis=-2)
        return jnp.stack(comps, axis=-2)

    # -- linear ops delegate to the prime field on flat arrays -------------

    def add(self, a, b):
        return self.prime.add(a, b)

    def sub(self, a, b):
        return self.prime.sub(a, b)

    def neg(self, a):
        return self.prime.neg(a)

    def double(self, a):
        return self.prime.add(a, a)

    def mul_small(self, a, k: int):
        return self.prime.mul_small(a, k)

    def cselect(self, cond, a, b):
        cond = cond.astype(jnp.bool_) if cond.dtype != jnp.bool_ else cond
        return jnp.where(cond[..., None, None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def broadcast_zero(self, batch_shape):
        return jnp.zeros(tuple(batch_shape) + (self.deg, self.L), jnp.uint32)

    def broadcast_one(self, batch_shape):
        one = np.zeros((self.deg, self.L), np.uint32)
        one[0] = self.prime.one
        return jnp.broadcast_to(jnp.asarray(one),
                                tuple(batch_shape) + (self.deg, self.L))

    # -- host conversions ---------------------------------------------------

    def encode(self, coeffs):
        """List of `deg` python ints (Fp coefficients, low first) ->
        Montgomery device array of shape (deg, L)."""
        assert len(coeffs) == self.deg
        return np.stack([self.prime.encode([c])[0] for c in coeffs])

    def decode(self, a):
        """(..., deg, L) -> nested list of python ints."""
        flat = np.asarray(jax.device_get(a)).reshape(-1, self.L)
        vals = self.prime.decode(flat)
        if not isinstance(vals, list):
            vals = [vals]
        out = np.array(vals, dtype=object).reshape(
            np.asarray(a).shape[:-1]).tolist()
        return out

    # -- exponentiation (generic square-and-multiply) -----------------------

    def pow_const(self, a, e: int, window: int = 2):
        if e == 0:
            return self.broadcast_one(a.shape[:-2])
        ebits = e.bit_length()
        nwin = -(-ebits // window)
        digits = np.array(
            [(e >> (window * i)) & ((1 << window) - 1)
             for i in range(nwin - 1, -1, -1)], dtype=np.int32)
        tbl = [self.broadcast_one(a.shape[:-2]), a]
        for _ in range(2, 1 << window):
            tbl.append(self.mul(tbl[-1], a))
        table = jnp.stack(tbl, axis=0)

        def body(res, dig):
            for _ in range(window):
                res = self.square(res)
            return self.mul(res, jnp.take(table, dig, axis=0)), None

        res, _ = jax.lax.scan(body, self.broadcast_one(a.shape[:-2]),
                              jnp.asarray(digits))
        return res

    def batch_inv(self, a):
        return self._inv_impl(a, batch=True)

    def inv(self, a):
        return self._inv_impl(a, batch=False)

    def _base_inv(self, x, batch: bool):
        if batch:
            return self.base.batch_inv(x)
        return self.base.inv(x)


class QuadraticExt(ExtField):
    """a0 + a1·u with u^2 = xi (xi in the base field, applied via nr_mul).

    All sub-field products of one tower op are STACKED into a single batched
    base-field mul (recursively), so an Fp12 op lowers to exactly one batched
    Fp mul kernel — both faster on TPU (bigger batches) and ~50x cheaper to
    compile than 54 separate CIOS loops.
    """

    arity = 2

    def mul(self, a, b):
        B = self.base
        a0, a1 = self.split(a)
        b0, b1 = self.split(b)
        lhs = jnp.stack([a0, a1, B.add(a0, a1)], axis=0)
        rhs = jnp.stack([b0, b1, B.add(b0, b1)], axis=0)
        v = B.mul(lhs, rhs)
        v0, v1, v01 = v[0], v[1], v[2]
        c0 = B.add(v0, self.nr_mul(v1))
        c1 = B.sub(B.sub(v01, v0), v1)
        return self.join((c0, c1))

    def square(self, a):
        B = self.base
        a0, a1 = self.split(a)
        lhs = jnp.stack([a0, B.add(a0, a1)], axis=0)
        rhs = jnp.stack([a1, B.add(a0, self.nr_mul(a1))], axis=0)
        v = B.mul(lhs, rhs)
        vv, t = v[0], v[1]
        c0 = B.sub(B.sub(t, vv), self.nr_mul(vv))
        c1 = B.add(vv, vv)
        return self.join((c0, c1))

    def _inv_impl(self, a, batch: bool):
        B = self.base
        a0, a1 = self.split(a)
        sq = B.mul(jnp.stack([a0, a1], 0), jnp.stack([a0, a1], 0))
        norm = B.sub(sq[0], self.nr_mul(sq[1]))
        ninv = self._base_inv(norm, batch)
        prods = B.mul(jnp.stack([a0, a1], 0),
                      jnp.stack([ninv, ninv], 0))
        return self.join((prods[0], B.neg(prods[1])))

    def conj(self, a):
        a0, a1 = self.split(a)
        return self.join((a0, self.base.neg(a1)))


class CubicExt(ExtField):
    """a0 + a1·v + a2·v^2 with v^3 = xi (via nr_mul). Karatsuba mul,
    Chung-Hasan SQR2 squaring, standard norm-based inversion
    (towers.nim CubicExt analogues). Sub-products stacked like QuadraticExt.
    """

    arity = 3

    def mul(self, a, b):
        B = self.base
        a0, a1, a2 = self.split(a)
        b0, b1, b2 = self.split(b)
        lhs = jnp.stack([a0, a1, a2, B.add(a1, a2), B.add(a0, a1),
                         B.add(a0, a2)], axis=0)
        rhs = jnp.stack([b0, b1, b2, B.add(b1, b2), B.add(b0, b1),
                         B.add(b0, b2)], axis=0)
        v = B.mul(lhs, rhs)
        v0, v1, v2, m12, m01, m02 = (v[i] for i in range(6))
        t0 = B.sub(B.sub(m12, v1), v2)
        t1 = B.sub(B.sub(m01, v0), v1)
        t2 = B.sub(B.sub(m02, v0), v2)
        c0 = B.add(v0, self.nr_mul(t0))
        c1 = B.add(t1, self.nr_mul(v2))
        c2 = B.add(t2, v1)
        return self.join((c0, c1, c2))

    def square(self, a):
        B = self.base
        a0, a1, a2 = self.split(a)
        t = B.sub(B.add(a0, a2), a1)
        lhs = jnp.stack([a0, a0, t, a1, a2], axis=0)
        rhs = jnp.stack([a0, a1, t, a2, a2], axis=0)
        v = B.mul(lhs, rhs)
        s0, ab, s2, bc, s4 = (v[i] for i in range(5))
        s1 = B.add(ab, ab)
        s3 = B.add(bc, bc)
        c0 = B.add(s0, self.nr_mul(s3))
        c1 = B.add(s1, self.nr_mul(s4))
        c2 = B.sub(B.sub(B.add(B.add(s1, s2), s3), s0), s4)
        return self.join((c0, c1, c2))

    def _inv_impl(self, a, batch: bool):
        B = self.base
        a0, a1, a2 = self.split(a)
        v = B.mul(jnp.stack([a0, a1, a2, a0, a1, a0], 0),
                  jnp.stack([a0, a2, a2, a1, a1, a2], 0))
        a0a0, a1a2, a2a2, a0a1, a1a1, a0a2 = (v[i] for i in range(6))
        v0 = B.sub(a0a0, self.nr_mul(a1a2))
        v1 = B.sub(self.nr_mul(a2a2), a0a1)
        v2 = B.sub(a1a1, a0a2)
        fv = B.mul(jnp.stack([a0, a2, a1], 0), jnp.stack([v0, v1, v2], 0))
        f = B.add(fv[0], self.nr_mul(B.add(fv[1], fv[2])))
        finv = self._base_inv(f, batch)
        out = B.mul(jnp.stack([v0, v1, v2], 0),
                    jnp.stack([finv, finv, finv], 0))
        return self.join((out[0], out[1], out[2]))


# ---------------------------------------------------------------------------
# Standard pairing towers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def build_tower(curve_name: str):
    """Build (Fp2, Fp6, Fp12) for a pairing curve from the registry params.

    Layout: Fp2 = Fp[u]/(u^2 - nr), Fp6 = Fp2[v]/(v^3 - xi),
    Fp12 = Fp6[w]/(w^2 - v) — same shape as the reference
    (towers.nim:33-65). Element coefficient order over Fp2 is
    (c0.c0, c0.c1, c0.c2, c1.c0, c1.c1, c1.c2) for Fp12 = c0 + c1*w
    i.e. w-degrees (0, 2, 4, 1, 3, 5).
    """
    from ..named.precompute import get_curve
    ctx = get_curve(curve_name)
    Fp = ctx.fp
    params = ctx.params
    nr = params.fp2_nonresidue

    if nr == -1:
        nr_mul = Fp.neg
    else:
        def nr_mul(x, _k=abs(nr), _neg=(nr < 0)):
            y = Fp.mul_small(x, _k)
            return Fp.neg(y) if _neg else y

    fp2 = QuadraticExt(Fp, nonresidue_mul=nr_mul, name=f"Fp2[{curve_name}]")

    xi0, xi1 = params.fp6_nonresidue

    def _small(a, k):
        if k == 0:
            return Fp.broadcast_zero(a.shape[:-1])
        y = Fp.mul_small(a, abs(k))
        return Fp.neg(y) if k < 0 else y

    def mul_by_xi(x):  # x in Fp2, xi = xi0 + xi1*u, u^2 = nr
        a0 = x[..., 0, :]
        a1 = x[..., 1, :]
        # (xi0 + xi1 u)(a0 + a1 u)
        #   = (xi0 a0 + nr xi1 a1) + (xi0 a1 + xi1 a0) u
        if (xi0, xi1) == (1, 1) and nr == -1:
            c0 = Fp.sub(a0, a1)
            c1 = Fp.add(a0, a1)
        else:
            c0 = Fp.add(_small(a0, xi0), _small(a1, nr * xi1))
            c1 = Fp.add(_small(a1, xi0), _small(a0, xi1))
        return jnp.stack([c0, c1], axis=-2)

    fp6 = CubicExt(fp2, nonresidue_mul=mul_by_xi, name=f"Fp6[{curve_name}]")

    def mul_by_v(x):  # x in Fp6 (…,6,L): (d0,d1,d2) -> (xi*d2, d0, d1)
        d0 = x[..., 0:2, :]
        d1 = x[..., 2:4, :]
        d2 = x[..., 4:6, :]
        return jnp.concatenate([mul_by_xi(d2), d0, d1], axis=-2)

    fp12 = QuadraticExt(fp6, nonresidue_mul=mul_by_v, name=f"Fp12[{curve_name}]")
    fp2.mul_by_xi = mul_by_xi
    return fp2, fp6, fp12
