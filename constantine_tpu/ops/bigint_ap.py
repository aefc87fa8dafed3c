"""Arbitrary-precision limb arithmetic: runtime-length divmod and powmod.

Own re-implementation of the reference's arbitrary-precision stack that
backs EVM MODEXP — constantine/math_arbitrary_precision/arithmetic/
{limbs_divmod.nim (vartime Knuth Algorithm D), limbs_mod2k.nim (power-of-2
split for even moduli), bigints_views.nim (Montgomery powmod over runtime
lengths)} — over this framework's 16-bit digit representation (numpy u32
rows holding 16-bit digits, little-endian). NO CPython bignum arithmetic
is used in any operational path; host ints appear only digit-wise (< 2^48
intermediate values inside Knuth D's qhat estimate, exactly like the
reference's 2-limb divisions).

This is host-side by design: MODEXP has no batch axis (one call, one
triple), matching the reference's CPU-only placement; the batched field
stacks in ops/field.py are the device path.
"""

from __future__ import annotations

import numpy as np

B = 16
MASK = (1 << B) - 1


# ---------------------------------------------------------------------------
# digit-vector helpers (LE u32 arrays of 16-bit digits)
# ---------------------------------------------------------------------------


def from_bytes(data: bytes) -> np.ndarray:
    """Big-endian bytes -> LE digit vector."""
    if len(data) % 2:
        data = b"\x00" + data
    if not data:
        return np.zeros(1, np.uint32)
    a = np.frombuffer(data, dtype=">u2").astype(np.uint32)[::-1].copy()
    return _norm(a)


def to_bytes(a: np.ndarray, length: int) -> bytes:
    """LE digit vector -> big-endian bytes of given length."""
    out = a[::-1].astype(">u2").tobytes()
    out = out.lstrip(b"\x00")
    if len(out) > length:
        out = out[-length:]
    return b"\x00" * (length - len(out)) + out


def _norm(a: np.ndarray) -> np.ndarray:
    """Strip leading (most-significant) zero digits; keep at least 1."""
    n = len(a)
    while n > 1 and a[n - 1] == 0:
        n -= 1
    return a[:n]


def is_zero(a) -> bool:
    return bool((np.asarray(a) == 0).all())


def cmp(a: np.ndarray, b: np.ndarray) -> int:
    a, b = _norm(a), _norm(b)
    if len(a) != len(b):
        return 1 if len(a) > len(b) else -1
    for i in range(len(a) - 1, -1, -1):
        if a[i] != b[i]:
            return 1 if a[i] > b[i] else -1
    return 0


def add(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    n = max(len(a), len(b)) + 1
    t = np.zeros(n, np.uint64)
    t[:len(a)] += a
    t[:len(b)] += b
    return _carry_u64(t)


def sub(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """a - b, requires a >= b."""
    t = np.zeros(len(a), np.int64)
    t[:len(a)] += a
    t[:len(b)] -= b
    borrow = 0
    out = np.zeros(len(a), np.uint32)
    for i in range(len(a)):
        v = int(t[i]) + borrow
        borrow = 0
        while v < 0:
            v += 1 << B
            borrow -= 1
        out[i] = v & MASK
        borrow += v >> B
    assert borrow == 0, "sub underflow"
    return _norm(out)


def _carry_u64(t: np.ndarray) -> np.ndarray:
    out = np.zeros(len(t), np.uint32)
    c = 0
    for i in range(len(t)):
        v = int(t[i]) + c
        out[i] = v & MASK
        c = v >> B
    assert c == 0
    return _norm(out)


def mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Schoolbook product via int64 accumulation columns."""
    t = np.zeros(len(a) + len(b) + 1, np.uint64)
    for i in range(len(a)):
        if a[i] == 0:
            continue
        t[i:i + len(b)] += np.uint64(int(a[i])) * b.astype(np.uint64)
        # 16x16 products < 2^32; up to 2^17 accumulations fit u64 — but
        # renormalize periodically to stay far from the edge
        if i % 1024 == 1023:
            t = _renorm_u64(t)
    return _carry_u64(t)


def _renorm_u64(t: np.ndarray) -> np.ndarray:
    lo = t & np.uint64(MASK)
    hi = t >> np.uint64(B)
    lo[1:] += hi[:-1]
    assert hi[-1] == 0
    return lo


def _bitlen_digit(d: int) -> int:
    return int(d).bit_length()


def divmod_ap(u: np.ndarray, v: np.ndarray):
    """Knuth Algorithm D (TAoCP 4.3.1) over 16-bit digits.
    Returns (q, r) with u = q*v + r, 0 <= r < v. Vartime (public data)."""
    u, v = _norm(u), _norm(v)
    if is_zero(v):
        raise ZeroDivisionError
    if cmp(u, v) < 0:
        return np.zeros(1, np.uint32), u.copy()
    n = len(v)
    if n == 1:
        # short division, sequential remainder sweep
        d = int(v[0])
        q = np.zeros(len(u), np.uint32)
        rem = 0
        for i in range(len(u) - 1, -1, -1):
            cur = (rem << B) | int(u[i])
            q[i] = cur // d
            rem = cur % d
        return _norm(q), np.array([rem], np.uint32)

    # D1: normalize so v's top digit >= 2^15
    shift = B - _bitlen_digit(int(v[n - 1]))
    un = _shl_bits(u, shift, extra_digit=True)
    vn = _shl_bits(v, shift, extra_digit=False)
    m = len(un) - 1 - n                       # number of quotient digits - 1
    q = np.zeros(m + 1, np.uint32)
    v_hi = int(vn[n - 1])
    v_hi2 = int(vn[n - 2])

    for j in range(m, -1, -1):
        # D3: estimate qhat from the top two dividend digits
        num = (int(un[j + n]) << B) | int(un[j + n - 1])
        qhat = num // v_hi
        rhat = num - qhat * v_hi
        while qhat > MASK or (
                qhat * v_hi2 > ((rhat << B) | int(un[j + n - 2]))):
            qhat -= 1
            rhat += v_hi
            if rhat > MASK:
                break
        # D4: multiply-subtract un[j..j+n] -= qhat * vn
        t = un[j:j + n + 1].astype(np.int64)
        t[:n] -= np.int64(qhat) * vn.astype(np.int64)
        borrow = 0
        for i in range(n + 1):
            val = int(t[i]) + borrow
            borrow = val >> B                  # floor toward -inf
            t[i] = val - (borrow << B)
        if borrow < 0:
            # D6: qhat one too large — add back
            qhat -= 1
            t[:n] += vn.astype(np.int64)
            carry = 0
            for i in range(n + 1):
                val = int(t[i]) + carry
                carry = val >> B
                t[i] = val & MASK
            # the final carry cancels the negative borrow
        un[j:j + n + 1] = t.astype(np.uint32)
        q[j] = qhat
    r = _shr_bits(un[:n], shift)
    return _norm(q), _norm(r)


def _shl_bits(a: np.ndarray, k: int, extra_digit: bool) -> np.ndarray:
    out = np.zeros(len(a) + 1, np.uint32)
    if k == 0:
        out[:len(a)] = a
    else:
        out[:len(a)] = (a << np.uint32(k)) & MASK
        out[1:len(a) + 1] |= a >> np.uint32(B - k)
    return out if extra_digit or out[-1] else out[:len(a)]


def _shr_bits(a: np.ndarray, k: int) -> np.ndarray:
    if k == 0:
        return a.copy()
    out = (a >> np.uint32(k)).astype(np.uint32)
    out[:-1] |= (a[1:] << np.uint32(B - k)) & MASK
    return out


# ---------------------------------------------------------------------------
# Montgomery powmod (odd modulus), mod-2^k powmod, CRT combine
# ---------------------------------------------------------------------------


def _neg_inv_digit(m0: int) -> int:
    """-m^-1 mod 2^16 by 2-adic Newton iteration (digit-local)."""
    x = 1
    for _ in range(4):                      # 2 -> 4 -> 8 -> 16 bits
        x = (x * (2 - m0 * x)) & MASK
    return (-x) & MASK


def _mont_mul(a: np.ndarray, b: np.ndarray, mod: np.ndarray,
              m0inv: int) -> np.ndarray:
    """CIOS over runtime length L (limbs_montgomery.nim:57 structure)."""
    L = len(mod)
    t = np.zeros(L + 2, np.uint64)
    bv = b.astype(np.uint64)
    mv = mod.astype(np.uint64)
    for i in range(L):
        ai = np.uint64(int(a[i]) if i < len(a) else 0)
        t[:L] += ai * bv
        t = _ripple2(t)
        mdig = np.uint64((int(t[0]) * m0inv) & MASK)
        t[:L] += mdig * mv
        t = _ripple2(t)
        assert t[0] & np.uint64(MASK) == 0
        t[:-1] = t[1:]
        t[-1] = 0
    out = _carry_u64(t)                     # full normalize (digits < 2^16)
    while cmp(out, mod) >= 0:               # result < 2*mod: <= 1 pass
        out = sub(out, mod)
    return np.pad(out, (0, max(0, L - len(out))))


def _ripple2(t: np.ndarray) -> np.ndarray:
    lo = t & np.uint64(MASK)
    hi = t >> np.uint64(B)
    lo[1:] += hi[:-1]
    assert hi[-1] == 0
    return lo


def _powmod_odd(base: np.ndarray, exp_bits, mod: np.ndarray) -> np.ndarray:
    """Montgomery square-and-multiply, MSB-first over exp_bits."""
    L = len(mod)
    m0inv = _neg_inv_digit(int(mod[0]))
    # R mod m and R^2 mod m via divmod (R = 2^(16L))
    R = np.zeros(2 * L + 1, np.uint32)
    R[2 * L] = 1                            # R^2
    _, r2 = divmod_ap(R, mod)
    r2 = np.pad(r2, (0, L - len(r2)))
    Rv = np.zeros(L + 1, np.uint32)
    Rv[L] = 1
    _, one_m = divmod_ap(Rv, mod)           # R mod m = Montgomery one
    one_m = np.pad(one_m, (0, L - len(one_m)))
    _, bred = divmod_ap(base, mod)
    bred = np.pad(bred, (0, L - len(bred)))
    bm = _mont_mul(bred, r2, mod, m0inv)    # base * R
    acc = one_m
    started = False
    for bit in exp_bits:
        if started:
            acc = _mont_mul(acc, acc, mod, m0inv)
        if bit:
            if started:
                acc = _mont_mul(acc, bm, mod, m0inv)
            else:
                acc = bm
                started = True
    # exp_bits is non-empty with a leading 1 (caller strips), so started
    assert started
    return _from_mont(acc, mod, m0inv)


def _from_mont(a: np.ndarray, mod: np.ndarray, m0inv: int) -> np.ndarray:
    one = np.zeros(len(mod), np.uint32)
    one[0] = 1
    return _norm(_mont_mul(a, one, mod, m0inv))


def _exp_bits(exp: np.ndarray):
    """MSB-first bit list of a digit vector."""
    exp = _norm(exp)
    bits = []
    for i in range(len(exp) - 1, -1, -1):
        for b in range(B - 1, -1, -1):
            bits.append((int(exp[i]) >> b) & 1)
    # strip leading zeros
    while bits and bits[0] == 0:
        bits.pop(0)
    return bits


def _powmod_2k(base: np.ndarray, exp_bits, k: int) -> np.ndarray:
    """base^exp mod 2^k by masked square-and-multiply
    (limbs_mod2k.nim analogue)."""
    nd = -(-k // B)
    topmask = MASK if k % B == 0 else (1 << (k % B)) - 1

    def trunc(a):
        a = a[:nd].copy() if len(a) >= nd else np.pad(a, (0, nd - len(a)))
        a[nd - 1] &= topmask
        return a

    acc = np.zeros(nd, np.uint32)
    acc[0] = 1
    b = trunc(base)
    for bit in exp_bits:
        acc = trunc(mul(acc, acc))
        if bit:
            acc = trunc(mul(acc, b))
    return _norm(acc)


def _inv_mod_2k(a: np.ndarray, k: int) -> np.ndarray:
    """a^-1 mod 2^k (a odd) by 2-adic Newton: x <- x(2 - a x)."""
    nd = -(-k // B)
    topmask = MASK if k % B == 0 else (1 << (k % B)) - 1

    def trunc(v):
        v = v[:nd].copy() if len(v) >= nd else np.pad(v, (0, nd - len(v)))
        v[nd - 1] &= topmask
        return v

    x = np.array([_neg_inv_digit(int(a[0]))], np.uint32)
    x[0] = (MASK + 1 - int(x[0])) & MASK    # digit inverse (positive)
    bits = B
    two = np.array([2], np.uint32)
    while bits < k:
        bits *= 2
        ax = mul(trunc(a), x)
        # 2 - a x  mod 2^bits: since a x === 1 mod 2^(bits/2), 2 - ax > 0
        # in the truncated ring; compute via complement
        ndl = -(-min(bits, k) // B)
        t = np.zeros(ndl, np.uint32)
        t[:min(len(ax), ndl)] = ax[:ndl]
        # 2 - t mod 2^bits
        comp = np.full(ndl, MASK, np.uint32)
        diff = sub(add(comp, np.array([3], np.uint32)), _norm(t))
        x = _norm(mul(x, diff)[:ndl])
    res = trunc(x)
    return _norm(res)


def powmod(base: np.ndarray, exp: np.ndarray, mod: np.ndarray) -> np.ndarray:
    """base^exp mod mod for arbitrary runtime-length operands.

    Odd modulus: Montgomery. Even modulus m = q * 2^k (q odd): compute
    x = base^exp mod q and y = base^exp mod 2^k, CRT-combine
    res = x + q * ((y - x) * q^-1 mod 2^k)  (bigints_views.nim /
    limbs_mod2k.nim split)."""
    mod = _norm(mod)
    if is_zero(mod):
        raise ZeroDivisionError
    if len(mod) == 1 and mod[0] == 1:
        return np.zeros(1, np.uint32)
    ebits = _exp_bits(exp)
    if not ebits:
        one = np.array([1], np.uint32)
        _, r = divmod_ap(one, mod)
        return r
    # split m = q * 2^k: drop whole zero digits, then bit-shift the rest
    k = 0
    q = mod.copy()
    while len(q) > 1 and q[0] == 0:
        q = q[1:]
        k += B
    while q[0] % 2 == 0:
        q = _norm(_shr_bits(q, 1))
        k += 1

    if k == 0:
        return _powmod_odd(base, ebits, mod)
    if len(q) == 1 and q[0] == 1:
        return _powmod_2k(base, ebits, k)
    x = _powmod_odd(base, ebits, q)
    y = _powmod_2k(base, ebits, k)
    qinv = _inv_mod_2k(q, k)
    # CRT combine: res = x + q * ((y - x) * q^-1 mod 2^k)
    pow2k = np.zeros(k // B + 1, np.uint32)
    pow2k[k // B] = 1 << (k % B)
    xt = x if cmp(x, pow2k) < 0 else divmod_ap(x, pow2k)[1]
    ymx = sub(add(y, pow2k), xt)
    ymx = divmod_ap(ymx, pow2k)[1]
    t = divmod_ap(mul(ymx, qinv), pow2k)[1]
    return _norm(add(x, mul(q, t)))
