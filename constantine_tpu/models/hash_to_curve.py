"""Hash-to-curve (RFC 9380): expand_message_xmd, SSWU map, isogeny,
endomorphism-accelerated cofactor clearing — batched over messages.

Re-design of the reference's hash-to-curve stack
(constantine/hash_to_curve/h2c_hash_to_field.nim:56-166 expandMessageXMD /
hashToField, h2c_map_to_isocurve_swu.nim SSWU, h2c_isogeny_maps.nim,
hash_to_curve.nim:290-325 public API, named/constants/bls12_381_subgroups.nim
clearCofactorFast): message expansion runs on host (SHA-256 over a few
hundred bytes), all field math (SSWU, isogeny, cofactor mul) runs batched on
device. The G2 cofactor is cleared with the Budroni–Pintore endomorphism
method P -> [x^2-x-1]P + [x-1]psi(P) + psi^2([2]P), bit-compatible with the
RFC's h_eff multiplication.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..named import h2c_constants as HC
from ..named.precompute import get_curve
from ..ops import limbs as lb
from ..ops.sqrt import SqrtCtx, get_sqrt_fp, get_sqrt_fp2
from ..ops.towers import build_tower
from ..utils import refmath as rm
from ..utils import refmath as rm
from ..utils.hashes import sha256


# ---------------------------------------------------------------------------
# expand_message_xmd (host, RFC 9380 §5.3.1)
# ---------------------------------------------------------------------------


def expand_message_xmd(msg: bytes, dst: bytes, len_in_bytes: int) -> bytes:
    assert len(dst) <= 255
    b_in_bytes = 32
    r_in_bytes = 64
    ell = -(-len_in_bytes // b_in_bytes)
    assert ell <= 255
    dst_prime = dst + bytes([len(dst)])
    z_pad = bytes(r_in_bytes)
    l_i_b_str = len_in_bytes.to_bytes(2, "big")
    msg_prime = z_pad + msg + l_i_b_str + b"\x00" + dst_prime
    b0 = sha256(msg_prime)
    bs = [sha256(b0 + b"\x01" + dst_prime)]
    for i in range(2, ell + 1):
        prev = bs[-1]
        xored = bytes(a ^ b for a, b in zip(b0, prev))
        bs.append(sha256(xored + bytes([i]) + dst_prime))
    return b"".join(bs)[:len_in_bytes]


def hash_to_field(msgs, dst: bytes, count: int, m: int, p: int):
    """Batched hash_to_field: for each msg, count elements of GF(p^m).
    Returns nested python ints [n_msgs][count][m] (host side; tiny).

    For multi-message batches the expand_message_xmd chains run
    lane-parallel on device (ops/sha256_jax.py) — the SIMD-SHA analogue
    (h2c_hash_to_field.nim:56 + sha256_x86_shaext.nim); the final mod-p
    of 4 small ints per message stays host-side."""
    L = 64
    uniforms = None
    if len(msgs) > 4:
        from ..ops.sha256_jax import expand_message_xmd_batch
        uniforms = expand_message_xmd_batch(msgs, dst, count * m * L)
    out = []
    for mi, msg in enumerate(msgs):
        uniform = uniforms[mi] if uniforms is not None \
            else expand_message_xmd(msg, dst, count * m * L)
        elems = []
        for i in range(count):
            coords = []
            for j in range(m):
                off = L * (j + i * m)
                coords.append(int.from_bytes(uniform[off:off + L], "big") % p)
            elems.append(coords)
        out.append(elems)
    return out


# ---------------------------------------------------------------------------
# SSWU + isogeny, generic over field-like
# ---------------------------------------------------------------------------


class SSWUMap:
    """Simplified SWU map to an isogenous curve + isogeny to E.

    F: field-like (Fp or Fp2); constants supplied as python ints/tuples.
    """

    def __init__(self, F, sqrt_ctx: SqrtCtx, A, B, Z, iso_xnum, iso_xden,
                 iso_ynum, iso_yden, host_inv):
        self.F = F
        self.sq = sqrt_ctx
        enc = self._enc
        self.A = enc(A)
        self.B = enc(B)
        self.Z = enc(Z)
        # precomputed -B/A and B/(Z*A) (host arithmetic via host_inv)
        mBdivA = host_inv("neg_div", B, A)
        BdivZA = host_inv("div", B, host_inv("mul", Z, A))
        self.mBdivA = enc(mBdivA)
        self.BdivZA = enc(BdivZA)
        self.xnum = [enc(c) for c in iso_xnum]
        self.xden = [enc(c) for c in iso_xden]
        self.ynum = [enc(c) for c in iso_ynum]
        self.yden = [enc(c) for c in iso_yden]
        self.map_to_curve = jax.jit(self.map_to_curve)

    def _enc(self, v):
        F = self.F
        if getattr(F, "deg", 1) == 1:
            return F.encode([v])[0] if not isinstance(v, (tuple, list)) \
                else F.encode([v[0]])[0]
        if not isinstance(v, (tuple, list)):
            v = (v, 0)
        return F.encode([v[0], v[1]])

    def _const(self, c, like):
        return jnp.broadcast_to(jnp.asarray(c), like.shape)

    def _sgn0(self, v):
        """RFC 9380 sgn0 (m = 1 or 2), canonical-domain parity."""
        F = self.F
        if getattr(F, "deg", 1) == 1:
            c = F.prime.from_mont(v) if hasattr(F, "prime") else F.from_mont(v)
            return (c[..., 0] & 1).astype(jnp.bool_)
        c = F.prime.from_mont(v)
        s0 = (c[..., 0, 0] & 1).astype(jnp.bool_)
        z0 = lb.is_zero(c[..., 0, :])
        s1 = (c[..., 1, 0] & 1).astype(jnp.bool_)
        return s0 | (z0 & s1)

    def map_to_curve(self, u):
        """SSWU (RFC 9380 F.2) + isogeny. u: batched field elements
        (Montgomery). Returns affine (x, y) on E (never infinity)."""
        F = self.F
        Z = self._const(self.Z, u)
        A = self._const(self.A, u)
        B = self._const(self.B, u)
        u2 = F.square(u)
        Zu2 = F.mul(Z, u2)
        tv = F.add(F.square(Zu2), Zu2)       # Z^2 u^4 + Z u^2
        tv1 = F.batch_inv(tv)                 # 0 if tv == 0
        e1 = F.is_zero(tv1)
        x1 = F.mul(self._const(self.mBdivA, u),
                   F.add(F.broadcast_one(self._bshape(u)), tv1))
        x1 = F.cselect(e1, self._const(self.BdivZA, u), x1)
        gx1 = F.add(F.mul(F.add(F.square(x1), A), x1), B)
        x2 = F.mul(Zu2, x1)
        gx2 = F.add(F.mul(F.add(F.square(x2), A), x2), B)
        y1, sq1 = self.sq.sqrt(gx1)
        y2, _ = self.sq.sqrt(gx2)
        x = F.cselect(sq1, x1, x2)
        y = F.cselect(sq1, y1, y2)
        flip = self._sgn0(u) != self._sgn0(y)
        y = F.cselect(flip, F.neg(y), y)
        return self._isogeny(x, y)

    def _bshape(self, u):
        return u.shape[:-1] if getattr(self.F, "deg", 1) == 1 else u.shape[:-2]

    def _horner(self, coeffs, x):
        acc = self._const(coeffs[-1], x)
        F = self.F
        for c in reversed(coeffs[:-1]):
            acc = F.add(F.mul(acc, x), self._const(c, x))
        return acc

    def _isogeny(self, x, y):
        """(x', y') on E' -> (xnum/xden, y' * ynum/yden) on E
        (h2c_isogeny_maps.nim analogue, batched single inversion)."""
        F = self.F
        xn = self._horner(self.xnum, x)
        xd = self._horner(self.xden, x)
        yn = self._horner(self.ynum, x)
        yd = self._horner(self.yden, x)
        stacked = jnp.stack([xd, yd], axis=0)
        inv = F.batch_inv(stacked.reshape((-1,) + stacked.shape[2:]))
        inv = inv.reshape(stacked.shape)
        return F.mul(xn, inv[0]), F.mul(y, F.mul(yn, inv[1]))


def find_z_svdw(p: int, A: int, B: int):
    """RFC 9380 H.1 Z-selection for the SVDW map (host-side)."""
    def g(x):
        return (x * x * x + A * x + B) % p

    def is_sq(v):
        return v == 0 or pow(v, (p - 1) // 2, p) == 1

    ctr = 1
    while True:
        for Z in (ctr, -ctr):
            Zp = Z % p
            gZ = g(Zp)
            if gZ == 0:
                continue
            t = (-(3 * Zp * Zp + 4 * A)) % p
            d = (4 * gZ) % p
            v = (t * pow(d, -1, p)) % p
            if v == 0 or not is_sq(v):
                continue
            if not (is_sq(gZ) or is_sq(g((-Zp * pow(2, -1, p)) % p))):
                continue
            return Zp
        ctr += 1


class SVDWMap:
    """Shallue–van de Woestijne map to E directly (RFC 9380 §6.6.1) —
    the reference's mapToCurve_svdw fallback
    (hash_to_curve/hash_to_curve.nim:40-91) for curves without a
    low-degree isogeny (BN254-Snarks G1/G2). Fully branchless: the three
    candidate x's are resolved with masked selects and three batched
    square-root chains.

    Fp only for now (m=1); constants derived host-side from (p, A, B).
    """

    def __init__(self, F, sqrt_ctx: SqrtCtx, p: int, A: int, B: int,
                 Z: int = None):
        self.F = F
        self.sq = sqrt_ctx
        self.p = p
        self.A_int, self.B_int = A % p, B % p
        if Z is None:
            Z = find_z_svdw(p, self.A_int, self.B_int)
        gZ = (Z * Z * Z + self.A_int * Z + self.B_int) % p
        c1 = gZ
        c2 = (-Z * pow(2, -1, p)) % p
        t = (-gZ * (3 * Z * Z + 4 * self.A_int)) % p
        c3 = rm.sqrt_mod(t, p)
        assert c3 is not None, "SVDW c3 must exist (Z selection)"
        if c3 & 1:       # sgn0(c3) must be 0
            c3 = p - c3
        c4 = (-4 * gZ * pow(3 * Z * Z + 4 * self.A_int, -1, p)) % p
        enc = lambda v: F.encode([v % p])[0]
        self.Z = enc(Z)
        self.c1 = enc(c1)
        self.c2 = enc(c2)
        self.c3 = enc(c3)
        self.c4 = enc(c4)
        self.A = enc(self.A_int)
        self.B = enc(self.B_int)
        self.map_to_curve = jax.jit(self.map_to_curve)

    def _const(self, c, like):
        return jnp.broadcast_to(jnp.asarray(c), like.shape)

    def _sgn0(self, v):
        c = self.F.from_mont(v)
        return (c[..., 0] & 1).astype(jnp.bool_)

    def _g(self, x):
        F = self.F
        return F.add(F.mul(F.add(F.square(x), self._const(self.A, x)), x),
                     self._const(self.B, x))

    def map_to_curve(self, u):
        """u: batched Fp elements (Montgomery) -> affine (x, y) on E."""
        F = self.F
        one = F.broadcast_one(u.shape[:-1])
        tv1 = F.mul(F.square(u), self._const(self.c1, u))
        tv2 = F.add(one, tv1)
        tv1 = F.sub(one, tv1)
        tv3 = F.batch_inv(F.mul(tv1, tv2))           # inv0
        tv4 = F.mul(F.mul(F.mul(u, tv1), tv3), self._const(self.c3, u))
        x1 = F.sub(self._const(self.c2, u), tv4)
        x2 = F.add(self._const(self.c2, u), tv4)
        x3 = F.add(F.mul(F.square(F.mul(F.square(tv2), tv3)),
                         self._const(self.c4, u)),
                   self._const(self.Z, u))
        gx1, gx2 = self._g(x1), self._g(x2)
        y1, e1 = self.sq.sqrt(gx1)
        y2, e2s = self.sq.sqrt(gx2)
        e2 = e2s & ~e1
        x = F.cselect(e1, x1, F.cselect(e2, x2, x3))
        gx = self._g(x)
        y3, _ = self.sq.sqrt(gx)
        y = F.cselect(e1, y1, F.cselect(e2, y2, y3))
        flip = self._sgn0(u) != self._sgn0(y)
        y = F.cselect(flip, F.neg(y), y)
        return x, y


class HashToCurveBN254G1:
    """hash-to-curve over BN254-Snarks G1 via SVDW (cofactor 1, so no
    clearing needed) — the reference's BN254 suite
    (named/constants/bn254_snarks_hash_to_curve_g1.nim uses SVDW too)."""

    def __init__(self):
        from ..named.precompute import get_curve
        from ..ops.sqrt import get_sqrt_fp
        self.ctx = get_curve("BN254_Snarks")
        self.svdw = SVDWMap(self.ctx.fp, get_sqrt_fp("BN254_Snarks"),
                            self.ctx.p, self.ctx.a, self.ctx.b)

    def hash_to_g1(self, msgs, dst: bytes):
        """msgs: list of bytes -> Jacobian G1 batch (len(msgs),)."""
        ctx = self.ctx
        us = hash_to_field(msgs, dst, count=2, m=1, p=ctx.p)
        n = len(msgs)
        u0 = [us[k][0][0] for k in range(n)]
        u1 = [us[k][1][0] for k in range(n)]
        u = jnp.asarray(ctx.fp.encode(u0 + u1))
        x, y = self.svdw.map_to_curve(u)
        P = ctx.g1.from_affine((x[:n], y[:n]))
        Q = ctx.g1.from_affine((x[n:], y[n:]))
        return ctx.g1.add(P, Q)


@functools.lru_cache(maxsize=None)
def get_h2c_bn254() -> HashToCurveBN254G1:
    return HashToCurveBN254G1()


# ---------------------------------------------------------------------------
# BLS12-381 G1/G2 hashers with cofactor clearing
# ---------------------------------------------------------------------------


class HashToCurveBLS12381:
    def __init__(self):
        self.ctx = get_curve("BLS12_381")
        self.fp2, _, _ = build_tower("BLS12_381")
        self.fp = self.ctx.fp
        p = self.ctx.p
        nr = self.ctx.params.fp2_nonresidue

        def hi_fp(op, a, b=None):
            if op == "neg_div":
                return (-a * rm.inv_mod(b, p)) % p
            if op == "div":
                return a * rm.inv_mod(b, p) % p
            if op == "mul":
                return a * b % p

        def tup(v):
            return v if isinstance(v, tuple) else (v, 0)

        def hi_fp2(op, a, b=None):
            a = tup(a)
            b = tup(b) if b is not None else None
            if op == "neg_div":
                v = rm.fp2_mul(a, rm.fp2_inv(b, nr, p), nr, p)
                return ((-v[0]) % p, (-v[1]) % p)
            if op == "div":
                return rm.fp2_mul(a, rm.fp2_inv(b, nr, p), nr, p)
            if op == "mul":
                return rm.fp2_mul(a, b, nr, p)

        self.g1_map = SSWUMap(self.fp, get_sqrt_fp("BLS12_381"),
                              HC.G1_SSWU_A, HC.G1_SSWU_B, HC.G1_SSWU_Z,
                              HC.G1_ISO_XNUM, HC.G1_ISO_XDEN,
                              HC.G1_ISO_YNUM, HC.G1_ISO_YDEN, hi_fp)
        self.g2_map = SSWUMap(self.fp2, get_sqrt_fp2("BLS12_381"),
                              HC.G2_SSWU_A, HC.G2_SSWU_B, HC.G2_SSWU_Z,
                              HC.G2_ISO_XNUM, HC.G2_ISO_XDEN,
                              HC.G2_ISO_YNUM, HC.G2_ISO_YDEN, hi_fp2)

        # psi constants: psi(x, y) = (conj(x)/gamma1_2, conj(y)/gamma1_3)
        xi = self.ctx.params.fp6_nonresidue

        def xi_pow(e):
            out = (1, 0)
            b = xi
            while e:
                if e & 1:
                    out = rm.fp2_mul(out, b, nr, p)
                b = rm.fp2_mul(b, b, nr, p)
                e >>= 1
            return out

        g12 = xi_pow(2 * (p - 1) // 6)
        g13 = xi_pow(3 * (p - 1) // 6)
        self.psi_x = self.fp2.encode(list(rm.fp2_inv(g12, nr, p)))
        self.psi_y = self.fp2.encode(list(rm.fp2_inv(g13, nr, p)))
        self.x_abs = abs(self.ctx.params.x_param)
        self.x_limbs = lb.int_to_limbs(self.x_abs, 4)
        self._clear_g1 = jax.jit(self._clear_g1)
        self._clear_g2 = jax.jit(self._clear_g2)

    # -- cofactor clearing ---------------------------------------------------

    def _mul_by_abs_x(self, group, P):
        n = P[0].shape[0]
        limbs = jnp.broadcast_to(jnp.asarray(self.x_limbs), (n, 4))
        return group.scalar_mul(limbs, P, scalar_bits=self.x_abs.bit_length())

    def _clear_g1(self, P):
        """[1 - x]P = P + [|x|]P for x < 0 (Wahby-Boneh, subgroups.nim:104)."""
        g1 = self.ctx.g1
        return g1.add(P, self._mul_by_abs_x(g1, P))

    def psi(self, P):
        """Untwist-Frobenius-twist endomorphism on G2 Jacobian points."""
        fp2 = self.fp2
        X, Y, Z = P
        px = jnp.broadcast_to(jnp.asarray(self.psi_x), X.shape)
        py = jnp.broadcast_to(jnp.asarray(self.psi_y), Y.shape)
        return (fp2.mul(fp2.conj(X), px),
                fp2.mul(fp2.conj(Y), py),
                fp2.conj(Z))

    def _clear_g2(self, P):
        """[x^2-x-1]P + [x-1]psi(P) + psi^2([2]P)
        (Budroni-Pintore, subgroups.nim:143)."""
        g2 = self.ctx.g2
        xP = g2.neg(self._mul_by_abs_x(g2, P))          # [x]P (x < 0)
        x2P = g2.neg(self._mul_by_abs_x(g2, xP))        # [x^2]P
        t = g2.add(x2P, g2.neg(g2.add(xP, P)))          # [x^2-x-1]P
        u = self.psi(g2.add(xP, g2.neg(P)))             # psi([x-1]P)
        v = self.psi(self.psi(g2.double(P)))            # psi^2([2]P)
        return g2.add(g2.add(t, u), v)

    # -- public API -----------------------------------------------------------

    def hash_to_g1(self, msgs, dst: bytes):
        """Batched hash-to-G1: list of messages -> Jacobian points (n, ...).
        (hash_to_curve.nim:290 hashToCurve for G1)."""
        us = hash_to_field(msgs, dst, count=2, m=1, p=self.ctx.p)
        flat = [u[0] for msg_u in us for u in msg_u]  # (2n,) ints
        u_arr = jnp.asarray(self.fp.encode(flat))
        x, y = self.g1_map.map_to_curve(u_arr)
        n = len(msgs)
        g1 = self.ctx.g1
        Q0 = g1.from_affine((x[0::2], y[0::2]))
        Q1 = g1.from_affine((x[1::2], y[1::2]))
        return self._clear_g1(g1.add(Q0, Q1))

    def hash_to_g2(self, msgs, dst: bytes):
        """Batched hash-to-G2 (the BLS-signature hot path,
        coreSign/coreVerify hashToCurve G2)."""
        us = hash_to_field(msgs, dst, count=2, m=2, p=self.ctx.p)
        flat = [u for msg_u in us for u in msg_u]     # (2n,) [c0, c1]
        u_arr = jnp.asarray(np.stack([self.fp2.encode(u) for u in flat]))
        x, y = self.g2_map.map_to_curve(u_arr)
        g2 = self.ctx.g2
        Q0 = g2.from_affine((x[0::2], y[0::2]))
        Q1 = g2.from_affine((x[1::2], y[1::2]))
        return self._clear_g2(g2.add(Q0, Q1))


@functools.lru_cache(maxsize=None)
def get_h2c() -> HashToCurveBLS12381:
    return HashToCurveBLS12381()
