"""Planar limb arithmetic primitives.

Field elements are represented as arrays of W=16-bit digits ("limbs") stored in
uint32 lanes, shape ``(..., L)`` with the batch axes leading and the limb axis
last (little-endian: limb 0 is the least significant digit). 16-bit digits are
chosen so that a digit-by-digit product fits exactly in a uint32 lane
(``(2^16-1)^2 < 2^32``) and column sums of up to ~2^13 such split products can
be accumulated carry-free in uint32 before a single normalization pass.

This module is the TPU-native analogue of the reference's fixed-limb layer
(``constantine/math/arithmetic/limbs.nim:61-369`` and the word intrinsics in
``constantine/platforms/intrinsics/addcarry_subborrow.nim``): instead of
64-bit words with hardware carry chains, we use redundant 32-bit accumulators
over 16-bit digits and explicit vectorized carry ripples, which is branchless
and therefore constant-time by construction in the SPMD sense.

Every sequential carry chain has two implementations selected by ``unroll``:
a ``lax.scan`` form (tiny trace, fast compile — default for tests/protocol
code) and a python-unrolled form (bigger trace, better fusion for hot TPU
kernels). Results are identical.

All functions are jit-friendly pure functions over jnp arrays.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

WORD_BITS = 16
MASK = np.uint32(0xFFFF)
BASE = 1 << WORD_BITS

# ---------------------------------------------------------------------------
# Host-side conversions (python int / bytes <-> limb arrays)
# ---------------------------------------------------------------------------


def num_limbs(bits: int) -> int:
    """Number of 16-bit limbs needed for a `bits`-bit integer."""
    return -(-bits // WORD_BITS)


def int_to_limbs(x: int, L: int) -> np.ndarray:
    """Python int -> (L,) uint32 limb array (little-endian 16-bit digits)."""
    if x < 0:
        raise ValueError("negative")
    out = np.zeros(L, dtype=np.uint32)
    for i in range(L):
        out[i] = x & 0xFFFF
        x >>= 16
    if x:
        raise ValueError("integer does not fit in limbs")
    return out


def limbs_to_int(a) -> int:
    """(L,) limb array -> python int."""
    a = np.asarray(a, dtype=np.uint64)
    x = 0
    for i in range(a.shape[-1] - 1, -1, -1):
        x = (x << 16) | int(a[..., i])
    return x


def ints_to_limbs(xs, L: int) -> np.ndarray:
    """Iterable of python ints -> (N, L) uint32 limb array."""
    xs = list(xs)
    out = np.zeros((len(xs), L), dtype=np.uint32)
    for j, x in enumerate(xs):
        out[j] = int_to_limbs(x, L)
    return out


def limbs_to_ints(a) -> list:
    """(..., L) limb array -> list of python ints (flattened batch)."""
    a = np.asarray(a)
    flat = a.reshape(-1, a.shape[-1])
    return [limbs_to_int(row) for row in flat]


def bytes_be_to_limbs(data: bytes, nbytes: int, L: int) -> np.ndarray:
    """Vectorized big-endian byte strings -> (N, L) limbs.

    ``data`` is N concatenated ``nbytes``-wide big-endian integers.
    Analogue of the reference's unmarshalBE (serialization/io_limbs.nim).
    """
    assert nbytes % 2 == 0
    n = len(data) // nbytes
    words = np.frombuffer(data, dtype=">u2").reshape(n, nbytes // 2)
    words = words[:, ::-1].astype(np.uint32)  # little-endian limb order
    if words.shape[1] < L:
        words = np.pad(words, ((0, 0), (0, L - words.shape[1])))
    return np.ascontiguousarray(words[:, :L])


def limbs_to_bytes_be(a, nbytes: int) -> bytes:
    """(N, L) limbs -> concatenated big-endian byte strings of width nbytes."""
    a = np.asarray(a, dtype=np.uint32)
    if a.ndim == 1:
        a = a[None]
    nwords = nbytes // 2
    w = a[:, :nwords].astype(">u2")[:, ::-1]
    return w.tobytes()


# ---------------------------------------------------------------------------
# Carry handling (device)
# ---------------------------------------------------------------------------


def _scan_limbs(body, init_c, arrays):
    """lax.scan over the trailing limb axis of one or more arrays.

    body(c, xs_tuple) -> (c', digit). Returns (digits ..., final_carry).
    """
    moved = tuple(jnp.moveaxis(a, -1, 0) for a in arrays)
    c, ys = jax.lax.scan(lambda c, xs: body(c, xs), init_c, moved)
    return jnp.moveaxis(ys, 0, -1), c


def normalize(t, unroll: bool = False):
    """Ripple-carry normalize: (..., L) uint32 redundant limbs (< 2^32) ->
    canonical digits (< 2^16), with any final overflow folded into the top
    limb (caller must size the array so the top limb cannot overflow)."""
    L = t.shape[-1]
    if unroll:
        parts = [t[..., i] for i in range(L)]
        for i in range(L - 1):
            carry = parts[i] >> WORD_BITS
            parts[i] = parts[i] & MASK
            parts[i + 1] = parts[i + 1] + carry
        return jnp.stack(parts, axis=-1)

    def body(c, xs):
        s = xs[0] + c
        return s >> WORD_BITS, s & MASK
    zero_c = jnp.zeros(t.shape[:-1], dtype=jnp.uint32)
    digits, c = _scan_limbs(body, zero_c, (t,))
    return digits.at[..., L - 1].add(c << WORD_BITS)


def add_carry(a, b, unroll: bool = False):
    """Full add with carry chain. Returns (sum_digits, carry_out).

    a, b: (..., L) canonical digits. sum_digits canonical, carry_out in {0,1}.
    """
    if unroll:
        L = a.shape[-1]
        outs = []
        c = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]),
                      dtype=jnp.uint32)
        for i in range(L):
            t = a[..., i] + b[..., i] + c
            outs.append(t & MASK)
            c = t >> WORD_BITS
        return jnp.stack(outs, axis=-1), c

    a, b = jnp.broadcast_arrays(a, b)

    def body(c, xs):
        t = xs[0] + xs[1] + c
        return t >> WORD_BITS, t & MASK
    zero_c = jnp.zeros(a.shape[:-1], dtype=jnp.uint32)
    return _scan_limbs(body, zero_c, (a, b))


def sub_borrow(a, b, unroll: bool = False):
    """Full subtract with borrow chain. Returns (diff_digits, borrow_out).

    diff = a - b mod 2^(16L); borrow_out is 1 if a < b else 0.
    """
    if unroll:
        L = a.shape[-1]
        outs = []
        c = jnp.ones(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]),
                     dtype=jnp.uint32)
        for i in range(L):
            t = a[..., i] + (MASK - b[..., i]) + c
            outs.append(t & MASK)
            c = t >> WORD_BITS
        return jnp.stack(outs, axis=-1), (jnp.uint32(1) - c)

    a, b = jnp.broadcast_arrays(a, b)

    def body(c, xs):
        t = xs[0] + (MASK - xs[1]) + c
        return t >> WORD_BITS, t & MASK
    one_c = jnp.ones(a.shape[:-1], dtype=jnp.uint32)
    digits, c = _scan_limbs(body, one_c, (a, b))
    return digits, (jnp.uint32(1) - c)


def cselect(cond, a, b):
    """Branchless select: cond ? a : b, broadcasting cond over the limb axis.

    cond: (...,) bool or uint32 0/1. Analogue of the reference's ccopy/mux
    (platforms/constant_time/multiplexers.nim) — on TPU every lane computes
    both sides, so this is constant-time by construction.
    """
    cond = cond.astype(jnp.bool_) if cond.dtype != jnp.bool_ else cond
    return jnp.where(cond[..., None], a, b)


def geq(a, b, unroll: bool = False):
    """a >= b as (...,) bool, canonical digits."""
    _, borrow = sub_borrow(a, b, unroll)
    return borrow == 0


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def shift_right_bits(a, k: int):
    """Logical right shift of the whole multiprecision value by k (< 16) bits."""
    assert 0 <= k < WORD_BITS
    if k == 0:
        return a
    lo = a >> k
    hi = jnp.concatenate(
        [a[..., 1:], jnp.zeros_like(a[..., :1])], axis=-1
    ) << (WORD_BITS - k)
    return (lo | (hi & MASK)).astype(jnp.uint32)


def get_bit(a, i):
    """Bit i (traced or static) of the multiprecision value, as uint32 0/1."""
    limb = jax.lax.dynamic_index_in_dim(a, i // WORD_BITS if isinstance(i, int)
                                        else i >> 4, axis=-1, keepdims=False)
    sh = (i % WORD_BITS) if isinstance(i, int) else (i & 15)
    return (limb >> sh) & 1
