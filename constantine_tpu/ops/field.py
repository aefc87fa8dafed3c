"""Batched prime-field arithmetic in Montgomery form (TPU-native).

A ``Field`` wraps a prime modulus p and exposes branchless, batch-first
modular arithmetic over planar 16-bit-limb arrays (see ``limbs.py``). All
elements live in the Montgomery domain (a·R mod p with R = 2^(16·L)) exactly
like the reference's ``Fp``/``Fr`` types (constantine/math/arithmetic/
finite_fields.nim:56-1043, named/properties_fields.nim:41-57), but the
algorithms are re-designed for SPMD TPU execution:

* Montgomery multiplication is a vectorized CIOS (coarsely integrated operand
  scanning) over 16-bit digits with redundant uint32 accumulators — the
  TPU re-expression of mulMont_CIOS_sparebit (limbs_montgomery.nim:180).
  Digit products split into lo/hi halves are accumulated carry-free; a single
  ripple at the end normalizes. No hardware carry chain is needed.
* Everything is branchless (masked selects), so the constant-time guarantees
  the reference gets from its SecretWord discipline hold by construction.
* Batch inversion uses Fermat + an associative-scan Montgomery trick
  (finite_fields.nim:922-1008 batchInv analogue) with log-depth parallelism.

Derived constants (R^2, m0ninv, Montgomery one, exponent addchains) are
precomputed host-side with python ints — the analogue of the reference's
compile-time derivation (named/deriv/precompute.nim:293-489).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as lb
from .limbs import MASK, WORD_BITS


class Field:
    """Prime field GF(p) with batched Montgomery-form arithmetic.

    Elements: uint32 arrays of shape (..., L), canonical digits (< 2^16),
    value < p, in the Montgomery domain unless a method says otherwise.
    """

    def __init__(self, p: int, name: str = "Fp", unroll: bool = None):
        if unroll is None:
            # CTT_FIELD_UNROLL=1: python-unrolled carry chains (bigger traces,
            # better XLA fusion — worth ~1.4x on TPU hot paths)
            import os
            unroll = os.environ.get("CTT_FIELD_UNROLL", "0") == "1"
        self.p_int = int(p)
        self.name = name
        self.bits = self.p_int.bit_length()
        self.L = lb.num_limbs(self.bits)
        L = self.L
        self.R_int = 1 << (WORD_BITS * L)
        self.unroll = unroll

        self.p = lb.int_to_limbs(self.p_int, L)
        self.r2 = lb.int_to_limbs((self.R_int * self.R_int) % self.p_int, L)
        self.one = lb.int_to_limbs(self.R_int % self.p_int, L)  # Montgomery 1
        self.zero = np.zeros(L, dtype=np.uint32)
        # -p^-1 mod 2^16 (single digit) — the CIOS m0ninv constant.
        self.m0ninv = np.uint32((-pow(self.p_int, -1, 1 << WORD_BITS)) % (1 << WORD_BITS))
        # Spare-bit style headroom check: 4p < R lets [0,2p) intermediates
        # stay valid as Montgomery-mul inputs (lazy reduction headroom).
        self.has_headroom = 4 * self.p_int < self.R_int

        # Jit all public element ops so host-side (eager) use is fast; when
        # called inside an outer trace these simply inline.
        for meth in ("add", "sub", "neg", "double", "mul", "square",
                     "to_mont", "from_mont", "inv", "div2",
                     "is_zero", "eq", "is_odd_canonical"):
            setattr(self, meth, jax.jit(getattr(self, meth)))
        self.batch_inv = jax.jit(self.batch_inv, static_argnames=("chain",))
        self.pow_const = jax.jit(self.pow_const, static_argnums=(1, 2))
        self.mul_small = jax.jit(self.mul_small, static_argnums=(1,))

        # On accelerator backends, multiplication routes through the fused
        # Pallas CIOS kernel (ops/pallas_field.py) by DEFAULT — ~2.8x over
        # the XLA lowering; square/to_mont/... pick it up via self.mul.
        # CTT_PALLAS=0 opts out (debug); CPU backends keep the XLA path
        # (the interpreter-mode kernel would be slower than XLA there).
        import os as _os
        if _os.environ.get("CTT_PALLAS", "1") != "0":
            try:
                if jax.default_backend() != "cpu":
                    from .pallas_field import PallasMontMul
                    self._xla_mul = self.mul   # kept for tiny batches
                    self._pallas = PallasMontMul(self)
                    self.mul = self._pallas.mul
            except Exception:
                pass

    # -- host-side conversions ------------------------------------------------

    def from_int(self, x) -> np.ndarray:
        """Python int(s) -> canonical-domain limb array (NOT Montgomery)."""
        if isinstance(x, int):
            return lb.int_to_limbs(x % self.p_int, self.L)
        return lb.ints_to_limbs([v % self.p_int for v in x], self.L)

    def to_int(self, a):
        """Canonical-domain limb array -> python int(s)."""
        vals = lb.limbs_to_ints(a)
        return vals[0] if np.asarray(a).ndim == 1 else vals

    def encode(self, x):
        """Python int(s) -> Montgomery-domain device array (host helper)."""
        return np.asarray(jax.device_get(self.to_mont(jnp.asarray(self.from_int(x)))))

    def decode(self, a):
        """Montgomery-domain array -> python int(s)."""
        return self.to_int(jax.device_get(self.from_mont(jnp.asarray(a))))

    # -- shape helpers ---------------------------------------------------------

    def broadcast_zero(self, shape):
        return jnp.zeros(tuple(shape) + (self.L,), dtype=jnp.uint32)

    def broadcast_one(self, shape):
        return jnp.broadcast_to(jnp.asarray(self.one), tuple(shape) + (self.L,))

    # -- core modular ops (Montgomery domain, canonical digits) ----------------

    def add(self, a, b):
        s, carry = lb.add_carry(a, b, self.unroll)
        # subtract p if s >= p (value fits in L digits + carry bit)
        d, borrow = lb.sub_borrow(s, jnp.broadcast_to(jnp.asarray(self.p), s.shape), self.unroll)
        take_d = (carry == 1) | (borrow == 0)
        return lb.cselect(take_d, d, s)

    def sub(self, a, b):
        d, borrow = lb.sub_borrow(a, b, self.unroll)
        dp, _ = lb.add_carry(d, jnp.broadcast_to(jnp.asarray(self.p), d.shape), self.unroll)
        return lb.cselect(borrow == 1, dp, d)

    def neg(self, a):
        d, _ = lb.sub_borrow(jnp.broadcast_to(jnp.asarray(self.p), a.shape), a, self.unroll)
        return lb.cselect(lb.is_zero(a), a, d)

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """Montgomery product a*b*R^-1 mod p. CIOS over 16-bit digits.

        TPU re-design of mulMont_CIOS_sparebit (limbs_montgomery.nim:180):
        redundant uint32 column accumulators, lo/hi split products, single
        final ripple + conditional subtract.
        """
        L = self.L
        p_arr = jnp.asarray(self.p)
        m0 = self.m0ninv

        a, b = jnp.broadcast_arrays(a, b)

        def step(t, ai):
            # t: (..., L+1) accumulators (< ~2^23), ai: (..., 1)
            prod = ai * b  # exact in uint32: both operands < 2^16
            zcol = jnp.zeros_like(t[..., :1])
            t = t + jnp.concatenate([prod & MASK, zcol], -1)
            t = t + jnp.concatenate([zcol, prod >> WORD_BITS], -1)
            m = ((t[..., :1] * m0) & MASK)
            prod2 = m * p_arr
            t = t + jnp.concatenate([prod2 & MASK, zcol], -1)
            t = t + jnp.concatenate([zcol, prod2 >> WORD_BITS], -1)
            carry = t[..., 0] >> WORD_BITS  # t[...,0] & MASK == 0 by design
            t = jnp.concatenate([t[..., 1:], jnp.zeros_like(t[..., :1])], -1)
            t = t.at[..., 0].add(carry)
            return t

        t = jnp.zeros(a.shape[:-1] + (L + 1,), dtype=jnp.uint32)
        if self.unroll:
            for i in range(L):
                t = step(t, a[..., i:i + 1])
        else:
            def body(i, t):
                ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=-1)
                return step(t, ai)
            t = jax.lax.fori_loop(0, L, body, t)

        t = lb.normalize(t, self.unroll)  # digits canonical; value < 2p so t[..., L] <= 1
        hi = t[..., L]
        r = t[..., :L]
        d, borrow = lb.sub_borrow(r, jnp.broadcast_to(p_arr, r.shape), self.unroll)
        take_d = (hi == 1) | (borrow == 0)
        return lb.cselect(take_d, d, r)

    def square(self, a):
        return self.mul(a, a)

    def to_mont(self, a):
        return self.mul(a, jnp.asarray(self.r2))

    def from_mont(self, a):
        one_canon = jnp.zeros_like(a).at[..., 0].set(1)
        return self.mul(a, one_canon)

    def mul_small(self, a, k: int):
        """Multiply by a small canonical integer constant (e.g. curve b=4)."""
        out = self.broadcast_zero(a.shape[:-1])
        base = a
        while k:
            if k & 1:
                out = self.add(out, base)
            k >>= 1
            if k:
                base = self.add(base, base)
        return out

    # -- exponentiation ---------------------------------------------------------

    def pow_const(self, a, e: int, window: int = 4):
        """a^e for a fixed (host-known) exponent. Fixed-window, branchless.

        Analogue of powMont (limbs_montgomery.nim:744) with the window table
        gathered via jnp.take (the secretLookup analogue).
        """
        if e == 0:
            return self.broadcast_one(a.shape[:-1])
        ebits = e.bit_length()
        nwin = -(-ebits // window)
        # host-side window digits, most significant first
        digits = np.array(
            [(e >> (window * i)) & ((1 << window) - 1) for i in range(nwin - 1, -1, -1)],
            dtype=np.int32,
        )
        # table[j] = a^j, j in [0, 2^window)
        tbl = [self.broadcast_one(a.shape[:-1]), a]
        for _ in range(2, 1 << window):
            tbl.append(self.mul(tbl[-1], a))
        table = jnp.stack(tbl, axis=0)  # (2^w, ..., L)

        def body(res, dig):
            for _ in range(window):
                res = self.square(res)
            res = self.mul(res, jnp.take(table, dig, axis=0))
            return res, None

        res, _ = jax.lax.scan(body, self.broadcast_one(a.shape[:-1]), jnp.asarray(digits))
        return res

    def inv(self, a):
        """Inverse via Fermat: a^(p-2). 0 maps to 0 (like the reference).

        The reference uses Bernstein-Yang safegcd (limbs_exgcd.nim:86) which
        is optimal on scalar CPUs; on TPU the fully-dense Fermat chain is
        branch-free and batches perfectly, so we use it instead.
        """
        return self.pow_const(a, self.p_int - 2)

    def batch_inv(self, a, chain: int = 32):
        """Montgomery-trick batch inversion over the (flattened) batch axes.

        TPU analogue of batchInv (finite_fields.nim:922): the batch is cut
        into ``chain``-long chains laid across the vector lanes. Two short
        scans (forward products, backward unwind) cost 3 muls per element,
        plus ONE vectorized Fermat inversion over the n/chain chain totals.
        Zero entries yield zero outputs (masked, like the reference's
        zero-handling path).
        """
        batch_shape = a.shape[:-1]
        n = int(np.prod(batch_shape)) if batch_shape else 1
        flat = a.reshape(n, self.L)
        zero_mask = lb.is_zero(flat)
        a_safe = lb.cselect(zero_mask, self.broadcast_one((n,)), flat)

        K = min(chain, n)
        pad = (-n) % K
        if pad:
            a_safe = jnp.concatenate(
                [a_safe, self.broadcast_one((pad,))], axis=0)
        G = (n + pad) // K
        x = a_safe.reshape(G, K, self.L).swapaxes(0, 1)  # (K, G, L)

        def fwd(carry, xi):  # emits exclusive prefix, carries running product
            return self.mul(carry, xi), carry
        tot, pre_exc = jax.lax.scan(fwd, self.broadcast_one((G,)), x)

        inv_tot = self.inv(tot)  # ONE Fermat chain, vectorized over G lanes

        def bwd(state, xs):  # state = inv of inclusive prefix at i
            xi, pei = xs
            out = self.mul(state, pei)
            return self.mul(state, xi), out
        _, invs = jax.lax.scan(bwd, inv_tot, (x, pre_exc), reverse=True)

        out = invs.swapaxes(0, 1).reshape(n + pad, self.L)[:n]
        out = lb.cselect(zero_mask, jnp.zeros_like(out), out)
        return out.reshape(a.shape)

    # -- predicates / misc ------------------------------------------------------

    def is_zero(self, a):
        return lb.is_zero(a)

    def eq(self, a, b):
        return lb.eq(a, b)

    def cselect(self, cond, a, b):
        return lb.cselect(cond, a, b)

    def is_odd_canonical(self, a):
        """LSB of the canonical (non-Montgomery) value."""
        return (self.from_mont(a)[..., 0] & 1).astype(jnp.bool_)

    def div2(self, a):
        """Halve a field element (Montgomery domain): (a + odd*p) >> 1."""
        odd = (a[..., 0] & 1) == 1
        ap, carry = lb.add_carry(a, jnp.broadcast_to(jnp.asarray(self.p), a.shape), self.unroll)
        half_a = lb.shift_right_bits(a, 1)
        half_ap = lb.shift_right_bits(ap, 1)
        # carry bit shifts into the top limb's bit 15
        top = half_ap[..., -1] | (carry << (WORD_BITS - 1))
        half_ap = half_ap.at[..., -1].set(top)
        return lb.cselect(odd, half_ap, half_a)
