"""Batched elliptic-curve group law (short Weierstrass, Jacobian coords).

TPU re-design of the reference's EC layer
(constantine/math/elliptic/ec_shortweierstrass_jacobian.nim:345-594 for the
constant-time group law, ec_shortweierstrass_affine.nim,
ec_shortweierstrass_batch_ops.nim:29-187 for batchAffine): every operation is
batched over leading axes and complete-by-masking — degenerate cases
(infinity, doubling, inverses) are resolved with lane-wise selects instead of
branches, which both matches TPU SPMD execution and gives constant-time
behaviour by construction.

The module is generic over a "field-like" object F (Field or an extension
tower from towers.py), so the same code provides G1 (Fp) and G2 (Fp2).

Point representations:
* Jacobian (X, Y, Z): x = X/Z^2, y = Y/Z^3; infinity encoded as Z == 0.
* Affine (x, y) + explicit inf mask where needed.

Points are tuples of field elements; a field element is a uint32 array
(..., L) for Fp or (..., k, L) for towers.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class ECGroup:
    """Short-Weierstrass group y^2 = x^3 + a*x + b over a field-like F."""

    def __init__(self, F, a_int, b_elem, name: str = "EC"):
        """F: field-like; a_int: small python int (0 or -3 typical);
        b_elem: curve b as an F element (device constant array)."""
        self.F = F
        self.a_int = a_int
        self.b = b_elem
        self.name = name
        for meth in ("double", "add", "madd", "neg", "cneg", "select",
                     "is_on_curve", "from_affine", "to_affine", "is_inf"):
            setattr(self, meth, jax.jit(getattr(self, meth)))
        self.scalar_mul = jax.jit(self.scalar_mul, static_argnames=("scalar_bits",))

    # -- constructors ---------------------------------------------------------

    def infinity(self, batch_shape=()) -> Tuple[Any, Any, Any]:
        F = self.F
        return (F.broadcast_one(batch_shape),
                F.broadcast_one(batch_shape),
                F.broadcast_zero(batch_shape))

    def from_affine(self, xy, inf_mask=None):
        """(x, y) affine (+ optional inf mask) -> Jacobian."""
        x, y = xy
        F = self.F
        batch = x.shape[:-1] if not hasattr(F, "deg") else x.shape[:-2]
        z = F.broadcast_one(batch)
        if inf_mask is not None:
            z = F.cselect(inf_mask, F.broadcast_zero(batch), z)
        return (x, y, z)

    def to_affine(self, P):
        """Jacobian -> affine ((x, y), inf_mask), batched single inversion.

        Analogue of batchAffine (ec_shortweierstrass_batch_ops.nim:29-80):
        one batched inversion for the whole array via F.batch_inv.
        """
        X, Y, Z = P
        F = self.F
        zinv = F.batch_inv(Z)          # 0 stays 0 for points at infinity
        zinv2 = F.square(zinv)
        x = F.mul(X, zinv2)
        y = F.mul(Y, F.mul(zinv, zinv2))
        return (x, y), F.is_zero(Z)

    def is_inf(self, P):
        return self.F.is_zero(P[2])

    # -- basic maps -----------------------------------------------------------

    def neg(self, P):
        X, Y, Z = P
        return (X, self.F.neg(Y), Z)

    def cneg(self, cond, P):
        X, Y, Z = P
        return (X, self.F.cselect(cond, self.F.neg(Y), Y), Z)

    def aff_cneg(self, cond, xy):
        """Conditional affine negation (for MSM signed digits)."""
        x, y = xy
        return (x, self.F.cselect(cond, self.F.neg(y), y))

    def select(self, cond, P, Q):
        """cond ? P : Q, lane-wise."""
        F = self.F
        return tuple(F.cselect(cond, p, q) for p, q in zip(P, Q))

    # -- group law ------------------------------------------------------------

    def double(self, P):
        """Jacobian doubling. dbl-2009-l for a=0, dbl-2007-b otherwise.

        Infinity-safe: Z=0 in => Z3=0 out; order-2 points (Y=0) => infinity.
        Mirrors the complete CT double of the reference (jacobian.nim:564).
        """
        F = self.F
        X, Y, Z = P
        if self.a_int == 0:
            A = F.square(X)
            B = F.square(Y)
            C = F.square(B)
            t = F.square(F.add(X, B))
            D = F.double(F.sub(F.sub(t, A), C))       # 2((X+B)^2 - A - C)
            E = F.add(F.double(A), A)                 # 3A
            Fq = F.square(E)
            X3 = F.sub(Fq, F.double(D))
            eight_c = F.double(F.double(F.double(C)))
            Y3 = F.sub(F.mul(E, F.sub(D, X3)), eight_c)
            Z3 = F.double(F.mul(Y, Z))
            return (X3, Y3, Z3)
        # general a: dbl-2007-b (M = 3X^2 + a Z^4)
        XX = F.square(X)
        YY = F.square(Y)
        YYYY = F.square(YY)
        ZZ = F.square(Z)
        S = F.double(F.sub(F.sub(F.square(F.add(X, YY)), XX), YYYY))
        aZZ2 = self._mul_a(F.square(ZZ))
        M = F.add(F.add(F.double(XX), XX), aZZ2)
        X3 = F.sub(F.square(M), F.double(S))
        Y3 = F.sub(F.mul(M, F.sub(S, X3)),
                   F.double(F.double(F.double(YYYY))))
        Z3 = F.sub(F.sub(F.square(F.add(Y, Z)), YY), ZZ)
        return (X3, Y3, Z3)

    def _mul_a(self, v):
        if self.a_int == 0:
            return self.F.broadcast_zero(v.shape[:-1] if not hasattr(self.F, "deg") else v.shape[:-2])
        if self.a_int == -3:
            return self.F.neg(self.F.mul_small(v, 3))
        if self.a_int > 0:
            return self.F.mul_small(v, self.a_int)
        return self.F.neg(self.F.mul_small(v, -self.a_int))

    def add(self, P, Q):
        """Complete Jacobian addition via masking (add-2007-bl core).

        Resolves P=inf, Q=inf, P==Q (double), P==-Q (infinity) with selects —
        the SPMD analogue of the reference's CT complete sum
        (jacobian.nim:345).
        """
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Z1Z1 = F.square(Z1)
        Z2Z2 = F.square(Z2)
        U1 = F.mul(X1, Z2Z2)
        U2 = F.mul(X2, Z1Z1)
        S1 = F.mul(F.mul(Y1, Z2), Z2Z2)
        S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
        H = F.sub(U2, U1)
        R = F.double(F.sub(S2, S1))
        I = F.square(F.double(H))
        J = F.mul(H, I)
        V = F.mul(U1, I)
        X3 = F.sub(F.sub(F.square(R), J), F.double(V))
        Y3 = F.sub(F.mul(R, F.sub(V, X3)), F.double(F.mul(S1, J)))
        Z3 = F.mul(F.sub(F.sub(F.square(F.add(Z1, Z2)), Z1Z1), Z2Z2), H)
        added = (X3, Y3, Z3)

        p_inf = F.is_zero(Z1)
        q_inf = F.is_zero(Z2)
        h_zero = F.is_zero(H)
        r_zero = F.is_zero(R)
        both = ~p_inf & ~q_inf
        is_dbl = both & h_zero & r_zero
        is_opp = both & h_zero & ~r_zero

        dbl = self.double(P)
        out = self.select(is_dbl, dbl, added)
        out = self.select(is_opp, self.infinity(self._bshape(out[2])), out)
        out = self.select(p_inf, Q, out)
        out = self.select(q_inf, P, out)
        return out

    def _bshape(self, elem):
        return elem.shape[:-1] if not hasattr(self.F, "deg") else elem.shape[:-2]

    def madd(self, P, Q_aff, q_inf=None):
        """Mixed add: Jacobian P + affine Q (Z2=1). madd-2007-bl core,
        complete via masking (reference mixedSum, jacobian.nim:466)."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2 = Q_aff
        Z1Z1 = F.square(Z1)
        U2 = F.mul(X2, Z1Z1)
        S2 = F.mul(F.mul(Y2, Z1), Z1Z1)
        H = F.sub(U2, X1)
        HH = F.square(H)
        I = F.double(F.double(HH))
        J = F.mul(H, I)
        R = F.double(F.sub(S2, Y1))
        V = F.mul(X1, I)
        X3 = F.sub(F.sub(F.square(R), J), F.double(V))
        Y3 = F.sub(F.mul(R, F.sub(V, X3)), F.double(F.mul(Y1, J)))
        Z3 = F.sub(F.sub(F.square(F.add(Z1, H)), Z1Z1), HH)
        added = (X3, Y3, Z3)

        p_inf = F.is_zero(Z1)
        h_zero = F.is_zero(H)
        r_zero = F.is_zero(R)
        is_dbl = ~p_inf & h_zero & r_zero
        is_opp = ~p_inf & h_zero & ~r_zero

        dbl = self.double(P)
        out = self.select(is_dbl, dbl, added)
        out = self.select(is_opp, self.infinity(self._bshape(out[2])), out)
        Qj = self.from_affine(Q_aff)
        out = self.select(p_inf, Qj, out)
        if q_inf is not None:
            out = self.select(q_inf, P, out)
        return out

    # -- predicates -----------------------------------------------------------

    def is_on_curve(self, P):
        """Y^2 == X^3 + a X Z^4 + b Z^6 (Jacobian); infinity is on-curve."""
        F = self.F
        X, Y, Z = P
        Z2 = F.square(Z)
        Z4 = F.square(Z2)
        Z6 = F.mul(Z4, Z2)
        # NB: tower elements must be explicitly broadcast (the deg axis is
        # positional, not broadcastable against batch axes).
        b = jnp.broadcast_to(jnp.asarray(self.b), Z6.shape)
        rhs = F.add(F.mul(F.square(X), X), F.mul(b, Z6))
        if self.a_int != 0:
            rhs = F.add(rhs, self._mul_a(F.mul(X, Z4)))
        return F.eq(F.square(Y), rhs) | F.is_zero(Z)

    def eq(self, P, Q):
        """Equality in the group (cross-multiplied, batched)."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Z1Z1 = F.square(Z1)
        Z2Z2 = F.square(Z2)
        x_eq = F.eq(F.mul(X1, Z2Z2), F.mul(X2, Z1Z1))
        y_eq = F.eq(F.mul(F.mul(Y1, Z2), Z2Z2), F.mul(F.mul(Y2, Z1), Z1Z1))
        both_inf = F.is_zero(Z1) & F.is_zero(Z2)
        one_inf = F.is_zero(Z1) ^ F.is_zero(Z2)
        return (x_eq & y_eq & ~one_inf) | both_inf

    # -- scalar multiplication --------------------------------------------------

    def scalar_mul(self, scalar_limbs, P, scalar_bits: int = None):
        """Constant-time double-and-add (MSB first), batched.

        scalar_limbs: (..., Ls) canonical 16-bit limbs (NOT Montgomery).
        The reference's CT fixed-window mul (ec_scalar_mul.nim:438) gains
        little on TPU (the select over the window table costs a gather);
        plain double-and-add with lane-wise select is already constant-time.
        """
        F = self.F
        nbits = scalar_bits or scalar_limbs.shape[-1] * 16

        def body(acc, i):
            limb = jax.lax.dynamic_index_in_dim(
                scalar_limbs, i >> 4, axis=-1, keepdims=False)
            bit = ((limb >> (i & 15)) & 1).astype(jnp.bool_)
            acc = self.double(acc)
            acc2 = self.add(acc, P)
            return self.select(bit, acc2, acc), None

        bits_desc = jnp.arange(nbits - 1, -1, -1, dtype=jnp.int32)
        init = self.infinity(self._bshape(P[2]))
        acc, _ = jax.lax.scan(body, init, bits_desc)
        return acc
