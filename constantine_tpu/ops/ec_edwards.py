"""Batched twisted Edwards group law (projective coordinates).

TPU re-design of the reference's twisted Edwards layer
(constantine/math/elliptic/ec_twistededwards_projective.nim:24,
ec_twistededwards_affine.nim:23, ec_twistededwards_batch_ops.nim): the
curve a*x^2 + y^2 = 1 + d*x^2*y^2 with a square and d non-square has a
COMPLETE unified addition law (add-2008-bbjlp) — no masking needed at all,
which makes it the friendliest group for SPMD hardware: every lane runs the
identical instruction stream for any input.

Covers Bandersnatch/Banderwagon (a = -5), Jubjub and Edwards25519 (a = -1).

Point representation: projective (X, Y, Z), x = X/Z, y = Y/Z.
Neutral element: (0, 1, 1). Field elements are Montgomery-form uint32
arrays (..., L) as in ops/field.py.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


class ECTwEdwards:
    """Twisted Edwards group a*x^2 + y^2 = 1 + d*x^2*y^2 over Field F."""

    def __init__(self, F, a_int: int, d_elem, name: str = "TwEdw"):
        """F: ops.field.Field; a_int: small python int (-1, -5 typical);
        d_elem: curve d as an encoded field element (device constant)."""
        self.F = F
        self.a_int = a_int
        self.d = d_elem
        self.name = name
        for meth in ("double", "add", "madd", "neg", "cneg", "select",
                     "is_on_curve", "from_affine", "to_affine", "is_neutral",
                     "eq", "eq_torsion"):
            setattr(self, meth, jax.jit(getattr(self, meth)))
        self.scalar_mul = jax.jit(self.scalar_mul,
                                  static_argnames=("scalar_bits",))

    # -- constructors ---------------------------------------------------------

    def neutral(self, batch_shape=()) -> Tuple[Any, Any, Any]:
        F = self.F
        return (F.broadcast_zero(batch_shape),
                F.broadcast_one(batch_shape),
                F.broadcast_one(batch_shape))

    # alias so generic protocol code (pedersen/IPA) can treat Weierstrass
    # and Edwards groups uniformly
    def infinity(self, batch_shape=()):
        return self.neutral(batch_shape)

    def from_affine(self, xy, inf_mask=None):
        x, y = xy
        F = self.F
        z = F.broadcast_one(x.shape[:-1])
        if inf_mask is not None:
            x = F.cselect(inf_mask, F.broadcast_zero(x.shape[:-1]), x)
            y = F.cselect(inf_mask, F.broadcast_one(x.shape[:-1]), y)
        return (x, y, z)

    def to_affine(self, P):
        """-> ((x, y), neutral_mask); one batched inversion."""
        X, Y, Z = P
        F = self.F
        zinv = F.batch_inv(Z)
        x = F.mul(X, zinv)
        y = F.mul(Y, zinv)
        return (x, y), self.is_neutral(P)

    def is_neutral(self, P):
        """x == 0 and y == z (the (0,1) point; (0,-1) is 2-torsion, not
        neutral)."""
        X, Y, Z = P
        return self.F.is_zero(X) & self.F.eq(Y, Z)

    # -- basic maps -----------------------------------------------------------

    def neg(self, P):
        X, Y, Z = P
        return (self.F.neg(X), Y, Z)

    def cneg(self, cond, P):
        X, Y, Z = P
        return (self.F.cselect(cond, self.F.neg(X), X), Y, Z)

    def aff_cneg(self, cond, xy):
        """Conditional affine negation: -(x, y) = (-x, y)."""
        x, y = xy
        return (self.F.cselect(cond, self.F.neg(x), x), y)

    def select(self, cond, P, Q):
        F = self.F
        return tuple(F.cselect(cond, p, q) for p, q in zip(P, Q))

    def _mul_a(self, v):
        if self.a_int == 0:
            return self.F.broadcast_zero(v.shape[:-1])
        if self.a_int > 0:
            return self.F.mul_small(v, self.a_int)
        return self.F.neg(self.F.mul_small(v, -self.a_int))

    def _mul_d(self, v):
        return self.F.mul(jnp.broadcast_to(jnp.asarray(self.d), v.shape), v)

    # -- group law ------------------------------------------------------------

    def add(self, P, Q):
        """Unified complete addition, add-2008-bbjlp.

        A=Z1*Z2, B=A^2, C=X1*X2, D=Y1*Y2, E=d*C*D, F=B-E, G=B+E,
        X3=A*F*((X1+Y1)*(X2+Y2)-C-D), Y3=A*G*(D-a*C), Z3=F*G.
        Complete for all inputs when d is non-square — no select masks
        (reference complete law: ec_twistededwards_projective.nim sum).
        """
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        A = F.mul(Z1, Z2)
        B = F.square(A)
        C = F.mul(X1, X2)
        D = F.mul(Y1, Y2)
        E = self._mul_d(F.mul(C, D))
        Fq = F.sub(B, E)
        G = F.add(B, E)
        t = F.sub(F.sub(F.mul(F.add(X1, Y1), F.add(X2, Y2)), C), D)
        X3 = F.mul(F.mul(A, Fq), t)
        Y3 = F.mul(F.mul(A, G), F.sub(D, self._mul_a(C)))
        Z3 = F.mul(Fq, G)
        return (X3, Y3, Z3)

    def madd(self, P, Q_aff, q_neutral=None):
        """Mixed add (Z2 = 1), madd-2008-bbjlp — same chain with A=Z1."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2 = Q_aff
        B = F.square(Z1)
        C = F.mul(X1, X2)
        D = F.mul(Y1, Y2)
        E = self._mul_d(F.mul(C, D))
        Fq = F.sub(B, E)
        G = F.add(B, E)
        t = F.sub(F.sub(F.mul(F.add(X1, Y1), F.add(X2, Y2)), C), D)
        X3 = F.mul(F.mul(Z1, Fq), t)
        Y3 = F.mul(F.mul(Z1, G), F.sub(D, self._mul_a(C)))
        Z3 = F.mul(Fq, G)
        out = (X3, Y3, Z3)
        if q_neutral is not None:
            out = self.select(q_neutral, P, out)
        return out

    def double(self, P):
        """dbl-2008-bbjlp: B=(X1+Y1)^2, C=X1^2, D=Y1^2, E=a*C, F=E+D,
        H=Z1^2, J=F-2H, X3=(B-C-D)*J, Y3=F*(E-D), Z3=F*J."""
        F = self.F
        X1, Y1, Z1 = P
        B = F.square(F.add(X1, Y1))
        C = F.square(X1)
        D = F.square(Y1)
        E = self._mul_a(C)
        Fq = F.add(E, D)
        H = F.square(Z1)
        J = F.sub(Fq, F.double(H))
        X3 = F.mul(F.sub(F.sub(B, C), D), J)
        Y3 = F.mul(Fq, F.sub(E, D))
        Z3 = F.mul(Fq, J)
        return (X3, Y3, Z3)

    # -- predicates -----------------------------------------------------------

    def is_on_curve(self, P):
        """(a X^2 + Y^2) Z^2 == Z^4 + d X^2 Y^2 (projective curve eq)."""
        F = self.F
        X, Y, Z = P
        XX = F.square(X)
        YY = F.square(Y)
        ZZ = F.square(Z)
        lhs = F.mul(F.add(self._mul_a(XX), YY), ZZ)
        rhs = F.add(F.square(ZZ), self._mul_d(F.mul(XX, YY)))
        return F.eq(lhs, rhs)

    def eq(self, P, Q):
        """Curve-point equality (cross-multiplied)."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        return (F.eq(F.mul(X1, Z2), F.mul(X2, Z1))
                & F.eq(F.mul(Y1, Z2), F.mul(Y2, Z1)))

    def eq_torsion(self, P, Q):
        """Equality in the quotient group modulo the 2-torsion point
        (0, -1) — the Banderwagon equality: x1*y2 == x2*y1
        (banderwagon spec; reference EC_TwEdw equality for Banderwagon)."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        return F.eq(F.mul(X1, Y2), F.mul(X2, Y1))

    # -- scalar multiplication ------------------------------------------------

    def scalar_mul(self, scalar_limbs, P, scalar_bits: int = None):
        """Constant-time double-and-add over 16-bit canonical limbs,
        batched (ec_scalar_mul.nim analogue; the complete law makes the
        accumulator loop maskless)."""
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
        init = self.neutral(P[2].shape[:-1])
        acc, _ = jax.lax.scan(body, init, bits_desc)
        return acc
