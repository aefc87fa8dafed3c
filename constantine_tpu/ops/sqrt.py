"""Square roots over field-likes (Fp and Fp2) — branchless, batched.

Re-design of the reference's square-root stack
(constantine/math/arithmetic/finite_fields_square_root.nim:29-192: p≡3 mod 4
addchain path + generic constant-time Tonelli-Shanks;
extension_fields/square_root_fp2.nim for Fp2): we implement

* the p ≡ 3 (mod 4) fast path  x^((p+1)/4),
* a generic constant-time Tonelli-Shanks (RFC 9380 appendix I.4 structure)
  over ANY field-like exposing mul/square/pow_const — the same code serves
  Fp with high 2-adicity (e.g. Fr) and Fp2 (where the 2-adicity of p^2-1 is
  tiny for BLS12-381, s=3).

All paths return (sqrt, is_square_mask) — fused like the reference's
sqrt_if_square. Choice of root is normalized to the lexicographically
smaller one? NO: Tonelli-Shanks returns an arbitrary root; codecs apply
their own sign normalization.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import refmath as rm


class SqrtCtx:
    """Square-root context for a field-like F of order q (host int)."""

    def __init__(self, F, q: int, nonresidue_coeffs=None):
        self.F = F
        self.q = q
        t = q - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        self.s, self.t = s, t
        self.is_3mod4 = (q % 4 == 3)
        self.is_5mod8 = (q % 8 == 5)
        self.sqrt_m1 = None
        if self.is_5mod8:
            # Atkin path (finite_fields_square_root.nim:58 analogue):
            # sqrt(-1) = 2^((q-1)/4), a device constant
            self.sqrt_m1 = np.asarray(F.encode([pow(2, (q - 1) // 4, q)]))[0] \
                if getattr(F, "deg", 1) == 1 else None
        if not self.is_3mod4:
            # find a quadratic nonresidue z (host side, Euler criterion)
            if nonresidue_coeffs is None:
                z = 2
                while pow(z, (q - 1) // 2, q) != q - 1:
                    z += 1
                self.z_enc = F.encode([z]) if getattr(F, "deg", 1) == 1 else None
                self.c_init_int = pow(z, t, q)
                self.c_enc = np.asarray(F.encode([self.c_init_int]))
            else:
                # extension field: caller supplies nonresidue coefficients and
                # we exponentiate on device once (cached at build).
                z = F.encode(nonresidue_coeffs)
                c = F.pow_const(jnp.asarray(z)[None], t)
                self.c_enc = np.asarray(jax.device_get(c))[0]
        self.sqrt = jax.jit(self.sqrt)
        self.invsqrt = jax.jit(self.invsqrt)
        self.sqrt_invsqrt = jax.jit(self.sqrt_invsqrt)

    def sqrt(self, a):
        """Returns (root, is_square). Zero maps to (0, True)."""
        F = self.F
        q, s, t = self.q, self.s, self.t
        if self.is_3mod4:
            r = F.pow_const(a, (q + 1) // 4)
            ok = F.eq(F.square(r), a)
            return r, ok | F.is_zero(a)

        if self.is_5mod8 and self.sqrt_m1 is not None:
            # x = a^((q+3)/8); if x^2 == -a, the root is x*sqrt(-1)
            x = F.pow_const(a, (q + 3) // 8)
            x2 = F.square(x)
            wrong = F.eq(x2, F.neg(a))
            xm = F.mul(x, jnp.broadcast_to(jnp.asarray(self.sqrt_m1), x.shape))
            r = F.cselect(wrong, xm, x)
            ok = F.eq(F.square(r), a)
            return r, ok | F.is_zero(a)

        # constant-time Tonelli-Shanks (RFC 9380 I.4, branchless selects)
        c3 = (t - 1) // 2
        z = F.pow_const(a, c3)            # a^((t-1)/2)
        tt = F.mul(F.mul(z, z), a)        # a^t
        z = F.mul(z, a)                   # a^((t+1)/2)
        b = tt
        bshape = tt.shape[:-1] if getattr(F, "deg", 1) == 1 else tt.shape[:-2]
        c = jnp.broadcast_to(jnp.asarray(self.c_enc), tt.shape)
        one = F.broadcast_one(bshape)
        # Outer descent as lax.fori_loop (trace stays O(1) in s; the
        # unrolled version compiled for minutes at s=32 on BLS12-381 Fr).
        # Runtime cost is the same O(s^2/2) sequential squarings.
        def outer(j, carry):
            z, tt, b, c = carry
            i = s - j
            bb = jax.lax.fori_loop(0, i - 2, lambda _, v: F.square(v), b)
            flag = ~F.eq(bb, one)
            z = F.cselect(flag, F.mul(z, c), z)
            c = F.square(c)
            tt = F.cselect(flag, F.mul(tt, c), tt)
            return (z, tt, tt, c)

        if s > 1:
            z, tt, b, c = jax.lax.fori_loop(0, s - 1, outer, (z, tt, b, c))
        ok = F.eq(F.square(z), a)
        return z, ok | F.is_zero(a)

    def invsqrt(self, a):
        """(1/sqrt(a), is_square). Zero maps to (0, True).

        Analogue of invsqrt (finite_fields_square_root.nim:136): for
        q ≡ 3 (mod 4) a single addchain a^((q-3)/4) gives the inverse root
        directly; otherwise sqrt + one batched inversion.
        """
        F = self.F
        if self.is_3mod4:
            r = F.pow_const(a, (self.q - 3) // 4)     # r^2 = 1/a for QRs
            ok = F.eq(F.mul(F.square(r), a), F.broadcast_one(
                a.shape[:-1] if getattr(F, "deg", 1) == 1 else a.shape[:-2]))
            return r, ok | F.is_zero(a)
        r, ok = self.sqrt(a)
        return F.mul(r, F.inv(a)), ok

    def sqrt_invsqrt(self, a):
        """Fused (sqrt, invsqrt, is_square) — sqrt_invsqrt analogue
        (finite_fields_square_root.nim:155): one exponentiation yields both
        for q ≡ 3 (mod 4): invsqrt = a^((q-3)/4), sqrt = a * invsqrt."""
        F = self.F
        if self.is_3mod4:
            ir = F.pow_const(a, (self.q - 3) // 4)
            r = F.mul(a, ir)
            ok = F.eq(F.square(r), a)
            return r, ir, ok | F.is_zero(a)
        r, ok = self.sqrt(a)
        return r, F.mul(r, F.inv(a)), ok


@functools.lru_cache(maxsize=None)
def get_sqrt_fp(curve_name: str) -> SqrtCtx:
    from ..named.precompute import get_curve
    ctx = get_curve(curve_name)
    return SqrtCtx(ctx.fp, ctx.p)


@functools.lru_cache(maxsize=None)
def get_sqrt_fr(curve_name: str) -> SqrtCtx:
    from ..named.precompute import get_curve
    ctx = get_curve(curve_name)
    return SqrtCtx(ctx.fr, ctx.r)


@functools.lru_cache(maxsize=None)
def get_sqrt_fp2(curve_name: str) -> SqrtCtx:
    """Sqrt over Fp2 (for G2 decompression). Nonresidue found host-side."""
    from ..named.precompute import get_curve
    from ..ops.towers import build_tower
    ctx = get_curve(curve_name)
    fp2, _, _ = build_tower(curve_name)
    p, nr = ctx.p, ctx.params.fp2_nonresidue
    # find QNR in Fp2 host-side: c is QNR iff norm^((p-1)/2) ... use
    # Euler: c^((p^2-1)/2) != 1 computed via host Fp2 pow
    def fp2_pow(base, e):
        r = (1, 0)
        b = base
        while e:
            if e & 1:
                r = rm.fp2_mul(r, b, nr, p)
            b = rm.fp2_mul(b, b, nr, p)
            e >>= 1
        return r
    q = p * p
    cand = None
    for c0, c1 in ((1, 1), (2, 1), (1, 2), (0, 1), (2, 0), (3, 1)):
        if fp2_pow((c0, c1), (q - 1) // 2) != (1, 0):
            cand = (c0, c1)
            break
    assert cand is not None
    return SqrtCtx(fp2, q, nonresidue_coeffs=[cand[0], cand[1]])
