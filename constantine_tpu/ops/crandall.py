"""Crandall / pseudo-Mersenne prime fields: p = 2^m - c with small c.

TPU re-design of the reference's Crandall-prime fast path
(constantine/math/arithmetic/limbs_crandall.nim, selected per-curve by
named/properties_fields.nim:104-112 — secp256k1's 2^256 - 2^32 - 977 is the
production user; the Mersenne61/127 test fields and Edwards25519's
2^255 - 19 qualify too).

Design differences from the Montgomery Field (ops/field.py):

* elements stay in CANONICAL form — there is no Montgomery domain, so
  to_mont/from_mont are identity maps and the Field API is otherwise
  unchanged (drop-in for ECGroup / towers / protocol code);
* mul = schoolbook full product (2L digit columns, redundant u32
  accumulators with a per-step carry extraction — the same carry-free
  column style as the CIOS kernel) followed by two folds
  lo + c·hi over the 2^m boundary and a final conditional subtract;
* the fold multiplies by c via c's 16-bit digits (c < 2^48 supported:
  up to 3 digit diagonals), entirely branchless.

Cost: L^2 digit products + ~2 short folds, vs the Montgomery CIOS's
2·L^2 (a·b plus m·p interleave) — ~1.8x fewer lane ops for secp256k1.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as lb
from .field import Field
from .limbs import MASK, WORD_BITS


def crandall_c(p: int, max_c_bits: int = 48):
    """If p = 2^m - c with small c (pseudo-Mersenne shape), return (m, c);
    else None. Smallness: c < 2^min(max_c_bits, m/2) and m >= 32 — the
    folding bounds in _reduce_2l assume c^2 < 2^m."""
    m = p.bit_length()
    c = (1 << m) - p
    if m >= 32 and 0 < c < (1 << min(max_c_bits, m // 2)):
        return m, c
    return None


class CrandallField(Field):
    """GF(2^m - c) with canonical-form batched arithmetic.

    Inherits every Field method; overrides the multiplicative core to use
    pseudo-Mersenne folding instead of Montgomery reduction. Elements are
    canonical digit arrays (value < p) at all times.
    """

    def __init__(self, p: int, name: str = "Fp", unroll: bool = None):
        mc = crandall_c(p)
        assert mc is not None, f"{name}: not a Crandall prime"
        self.m_exp, self.c_small = mc
        super().__init__(p, name, unroll)
        # canonical representation: "Montgomery one" is plain 1, R^2 unused
        self.one = lb.int_to_limbs(1, self.L)
        # digits of c (at most 3 for c < 2^48)
        cd = []
        c = self.c_small
        while c:
            cd.append(c & 0xFFFF)
            c >>= 16
        self.c_digits = cd or [0]
        # NB: Field.__init__ already jitted the bound methods — jit is lazy,
        # so the subclass overrides (mul/to_mont/...) trace with the
        # attributes set above on first call; no re-binding needed.
        self.c_limbs = lb.int_to_limbs(self.c_small, self.L)

    # -- domain maps: canonical form, so identity --------------------------------

    def to_mont(self, a):
        return a

    def from_mont(self, a):
        return a

    def encode(self, x):
        return self.from_int(x)

    def decode(self, a):
        import jax as _jax
        return self.to_int(_jax.device_get(a))

    # -- multiplicative core ------------------------------------------------------

    def _full_product(self, a, b):
        """(..., L) x (..., L) -> (..., 2L) canonical digits of a*b."""
        L = self.L
        a, b = jnp.broadcast_arrays(a, b)
        t = jnp.zeros(a.shape[:-1] + (2 * L,), dtype=jnp.uint32)

        def step(i, t):
            ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=-1)
            prod = ai * b                      # exact in u32
            lo = jnp.zeros_like(t)
            lo = jax.lax.dynamic_update_slice_in_dim(lo, prod & MASK, i,
                                                     axis=-1)
            hi = jnp.zeros_like(t)
            hi = jax.lax.dynamic_update_slice_in_dim(hi, prod >> WORD_BITS,
                                                     i, axis=-1)
            hi = jnp.roll(hi, 1, axis=-1)
            t = t + lo + hi
            # keep accumulators below 2^32: extract carries each step
            carry = t >> WORD_BITS
            t = (t & MASK) + jnp.concatenate(
                [jnp.zeros_like(carry[..., :1]), carry[..., :-1]], axis=-1)
            return t

        if self.unroll:
            for i in range(L):
                t = step(i, t)
        else:
            t = jax.lax.fori_loop(0, L, step, t)
        return lb.normalize(t, self.unroll)

    def _mul_by_c(self, h, out_len: int):
        """h (..., K) canonical digits * c -> (..., out_len) canonical."""
        t = jnp.zeros(h.shape[:-1] + (out_len,), dtype=jnp.uint32)
        K = h.shape[-1]
        for j, cd in enumerate(self.c_digits):
            if cd == 0:
                continue
            prod = h * jnp.uint32(cd)
            width = min(K, out_len - j)
            pl = jnp.zeros_like(t)
            pl = pl.at[..., j:j + width].set((prod & MASK)[..., :width])
            ph = jnp.zeros_like(t)
            wh = min(K, out_len - j - 1)
            ph = ph.at[..., j + 1:j + 1 + wh].set(
                (prod >> WORD_BITS)[..., :wh])
            t = t + pl + ph
            carry = t >> WORD_BITS
            t = (t & MASK) + jnp.concatenate(
                [jnp.zeros_like(carry[..., :1]), carry[..., :-1]], axis=-1)
        return lb.normalize(t, self.unroll)

    def _split_at_m(self, t):
        """t (..., K) digits -> (lo = t mod 2^m as L digits,
        hi = t >> m, K - m//16 digits)."""
        L = self.L
        m = self.m_exp
        kdig = m // WORD_BITS
        kbit = m % WORD_BITS
        if kbit == 0:
            lo = t[..., :kdig]
            hi = t[..., kdig:]
        else:
            lo = t[..., :kdig + 1].at[..., kdig].set(
                t[..., kdig] & ((1 << kbit) - 1))
            hi_full = t[..., kdig:]
            hi = lb.shift_right_bits(hi_full, kbit)
        # pad lo to L digits
        if lo.shape[-1] < L:
            lo = jnp.concatenate(
                [lo, jnp.zeros(lo.shape[:-1] + (L - lo.shape[-1],),
                               jnp.uint32)], axis=-1)
        return lo, hi

    def _reduce_2l(self, t):
        """(..., 2L) full product digits -> canonical (..., L) mod p."""
        L = self.L
        # fold 1: t = lo + c * hi   (hi has up to 2L - m/16 digits;
        # result <= 2^m - 1 + c*(2^(32L - m)) — still > 2^m, fold again)
        lo, hi = self._split_at_m(t)
        ch = self._mul_by_c(hi, L + len(self.c_digits) + 1)
        low = jnp.concatenate(
            [lo, jnp.zeros(lo.shape[:-1] + (ch.shape[-1] - L,), jnp.uint32)],
            axis=-1)
        t1 = lb.normalize(low + ch, self.unroll)
        # fold 2: now hi is at most a couple digits
        lo2, hi2 = self._split_at_m(t1)
        ch2 = self._mul_by_c(hi2, L)
        t2, carry = lb.add_carry(lo2, ch2, self.unroll)
        # fold 3: when m == 16L the add can wrap (carry bit set); the
        # wrapped 2^(16L) = 2^m ≡ c (mod p), so add c back — the second
        # wrap is impossible (t2 < c after a wrap, t2 + c < 2^m).
        if self.m_exp == 16 * L:
            cb = jnp.broadcast_to(jnp.asarray(self.c_limbs), t2.shape)
            t2c, _ = lb.add_carry(t2, cb, self.unroll)
            t2 = lb.cselect(carry == 1, t2c, t2)
        # conditional subtracts: value < 2^m + c·k for tiny k, so at most
        # 2 subtractions of p are needed
        p_arr = jnp.broadcast_to(jnp.asarray(self.p), t2.shape)
        for _ in range(2):
            d, borrow = lb.sub_borrow(t2, p_arr, self.unroll)
            t2 = lb.cselect(borrow == 0, d, t2)
        return t2

    def mul(self, a, b):
        return self._reduce_2l(self._full_product(a, b))

    def square(self, a):
        return self.mul(a, a)
