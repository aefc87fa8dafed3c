"""Host-side reference math over python ints.

Slow, obviously-correct implementations used ONLY for:
* registry-build-time validation of derived constants,
* test-vector generation (the analogue of the reference's sage scripts
  in /root/reference/sage/ and GMP differential tests,
  tests/math_fields/t_finite_fields_vs_gmp.nim),
* host-side fallbacks for tiny one-off protocol values.

Never used on the device path.
"""

from __future__ import annotations


def inv_mod(a: int, m: int) -> int:
    return pow(a, -1, m)


def sqrt_mod(a: int, p: int):
    """Tonelli-Shanks; returns a square root or None if non-residue."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # general Tonelli-Shanks
    s, q = 0, p - 1
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c, t, r = i, b * b % p, t * b * b % p, r * b % p
    return r


# -- affine short-Weierstrass EC over GF(p), python ints ---------------------
# Points are (x, y) tuples or None for infinity.


def ec_add(P, Q, a: int, p: int):
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        lam = (3 * x1 * x1 + a) * inv_mod(2 * y1, p) % p
    else:
        lam = (y2 - y1) * inv_mod(x2 - x1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return (x3, y3)


def ec_double(P, a: int, p: int):
    return ec_add(P, P, a, p)


def ec_mul(k: int, P, a: int, p: int):
    R = None
    Q = P
    while k:
        if k & 1:
            R = ec_add(R, Q, a, p)
        Q = ec_add(Q, Q, a, p)
        k >>= 1
    return R


def ec_neg(P, p: int):
    return None if P is None else (P[0], (-P[1]) % p)


def ec_is_on_curve(P, a: int, b: int, p: int) -> bool:
    if P is None:
        return True
    x, y = P
    return (y * y - (x * x * x + a * x + b)) % p == 0


# -- GF(p^2) as pairs (c0, c1) with u^2 = non_residue ------------------------


def fp2_mul(x, y, nr: int, p: int):
    a0, a1 = x
    b0, b1 = y
    return ((a0 * b0 + nr * a1 * b1) % p, (a0 * b1 + a1 * b0) % p)


def fp2_add(x, y, p: int):
    return ((x[0] + y[0]) % p, (x[1] + y[1]) % p)


def fp2_sub(x, y, p: int):
    return ((x[0] - y[0]) % p, (x[1] - y[1]) % p)


def fp2_inv(x, nr: int, p: int):
    a0, a1 = x
    d = (a0 * a0 - nr * a1 * a1) % p
    di = inv_mod(d, p)
    return (a0 * di % p, (-a1) * di % p)


def ec2_add(P, Q, a2, nr: int, p: int):
    """EC group law over GF(p^2); a2 is the Fp2 'a' coefficient pair."""
    if P is None:
        return Q
    if Q is None:
        return P
    (x1, y1), (x2, y2) = P, Q
    if x1 == x2:
        if fp2_add(y1, y2, p) == (0, 0):
            return None
        num = fp2_add(fp2_mul((3, 0), fp2_mul(x1, x1, nr, p), nr, p), a2, p)
        den = fp2_mul((2, 0), y1, nr, p)
    else:
        num = fp2_sub(y2, y1, p)
        den = fp2_sub(x2, x1, p)
    lam = fp2_mul(num, fp2_inv(den, nr, p), nr, p)
    x3 = fp2_sub(fp2_sub(fp2_mul(lam, lam, nr, p), x1, p), x2, p)
    y3 = fp2_sub(fp2_mul(lam, fp2_sub(x1, x3, p), nr, p), y1, p)
    return (x3, y3)


def ec2_mul(k: int, P, a2, nr: int, p: int):
    R = None
    Q = P
    while k:
        if k & 1:
            R = ec2_add(R, Q, a2, nr, p)
        Q = ec2_add(Q, Q, a2, nr, p)
        k >>= 1
    return R


# -- twisted Edwards host reference (a*x^2 + y^2 = 1 + d*x^2*y^2) -----------
# Affine points as (x, y); neutral = (0, 1). Used for registry validation
# and golden tests (reference ec_twistededwards_affine.nim law).


def ed_add(P, Q, a: int, d: int, p: int):
    x1, y1 = P
    x2, y2 = Q
    dxy = d * x1 * x2 * y1 * y2 % p
    x3 = (x1 * y2 + y1 * x2) * inv_mod((1 + dxy) % p, p) % p
    y3 = (y1 * y2 - a * x1 * x2) * inv_mod((1 - dxy) % p, p) % p
    return (x3, y3)


def ed_mul(k: int, P, a: int, d: int, p: int):
    acc = (0, 1)
    while k:
        if k & 1:
            acc = ed_add(acc, P, a, d, p)
        P = ed_add(P, P, a, d, p)
        k >>= 1
    return acc


def ed_is_on_curve(P, a: int, d: int, p: int) -> bool:
    x, y = P
    return (a * x * x + y * y) % p == (1 + d * x * x * y * y) % p
