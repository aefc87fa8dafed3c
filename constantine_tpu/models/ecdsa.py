"""ECDSA signatures (secp256k1 / P-256) with RFC 6979 deterministic nonces.

Re-design of the reference's ECDSA stack
(constantine/signatures/ecdsa.nim sign/verify with RFC6979 nonce generation,
serialization/codecs_ecdsa*.nim DER codecs): nonce generation and scalar
algebra run host-side (python-int modular arithmetic — small fixed work),
the EC scalar multiplications run batched on device.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..named.precompute import get_curve
from ..ops import limbs as lb
from ..utils.hashes import hmac_sha256, sha256


def _bits2int(data: bytes, qlen: int) -> int:
    x = int.from_bytes(data, "big")
    blen = len(data) * 8
    if blen > qlen:
        x >>= blen - qlen
    return x


def rfc6979_nonce(x: int, h1: bytes, q: int) -> int:
    """RFC 6979 §3.2 deterministic k (HMAC-SHA256)."""
    qlen = q.bit_length()
    rlen = (qlen + 7) // 8
    bx = x.to_bytes(rlen, "big")
    bh = (_bits2int(h1, qlen) % q).to_bytes(rlen, "big")
    V = b"\x01" * 32
    K = b"\x00" * 32
    K = hmac_sha256(K, V + b"\x00" + bx + bh)
    V = hmac_sha256(K, V)
    K = hmac_sha256(K, V + b"\x01" + bx + bh)
    V = hmac_sha256(K, V)
    while True:
        t = b""
        while len(t) < rlen:
            V = hmac_sha256(K, V)
            t += V
        k = _bits2int(t[:rlen], qlen)
        if 1 <= k < q:
            return k
        K = hmac_sha256(K, V + b"\x00")
        V = hmac_sha256(K, V)


class ECDSA:
    def __init__(self, curve_name: str = "Secp256k1"):
        self.ctx = get_curve(curve_name)
        self.n = self.ctx.r

    def _mul_g(self, ks):
        """Batched [k]G -> affine python ints [(x, y)]."""
        ctx = self.ctx
        m = len(ks)
        limbs = jnp.asarray(ctx.scalars_to_limbs(ks))
        G = ctx.g1.from_affine(tuple(
            jnp.broadcast_to(g, (m,) + g.shape[1:]) for g in ctx.g1_gen))
        P = ctx.g1.scalar_mul(limbs, G)
        (x, y), inf = ctx.g1.to_affine(P)
        xs = ctx.fp.decode(x)
        ys = ctx.fp.decode(y)
        if not isinstance(xs, list):
            xs, ys = [xs], [ys]
        return list(zip(xs, ys))

    def sign(self, secret_keys, msgs, hash_fn=sha256):
        """Batched deterministic ECDSA (ecdsa.nim sign): returns [(r, s)]
        with low-s normalization."""
        n = self.n
        h1s = [hash_fn(m) for m in msgs]
        ks = [rfc6979_nonce(d, h1, n) for d, h1 in zip(secret_keys, h1s)]
        Rs = self._mul_g(ks)
        out = []
        for d, h1, k, R in zip(secret_keys, h1s, ks, Rs):
            z = _bits2int(h1, n.bit_length()) % n
            r = R[0] % n
            assert r != 0
            s = pow(k, -1, n) * (z + r * d) % n
            if s > n // 2:
                s = n - s
            out.append((r, s))
        return out

    def verify(self, pub_points, msgs, sigs, hash_fn=sha256):
        """Batched verify: pub_points = [(x, y) python ints]. Returns
        np.bool_ array. R' = [u1]G + [u2]Q, accept iff R'.x mod n == r."""
        ctx = self.ctx
        n = self.n
        m = len(msgs)
        u1s, u2s, ok = [], [], []
        for (r, s), msg in zip(sigs, msgs):
            valid = 0 < r < n and 0 < s < n
            z = _bits2int(hash_fn(msg), n.bit_length()) % n
            sinv = pow(s, -1, n) if valid else 1
            u1s.append(z * sinv % n)
            u2s.append(r * sinv % n)
            ok.append(valid)
        limbs1 = jnp.asarray(ctx.scalars_to_limbs(u1s))
        limbs2 = jnp.asarray(ctx.scalars_to_limbs(u2s))
        G = ctx.g1.from_affine(tuple(
            jnp.broadcast_to(g, (m,) + g.shape[1:]) for g in ctx.g1_gen))
        qx = jnp.asarray(ctx.fp.encode([p[0] for p in pub_points]))
        qy = jnp.asarray(ctx.fp.encode([p[1] for p in pub_points]))
        Q = ctx.g1.from_affine((qx, qy))
        R1 = ctx.g1.scalar_mul(limbs1, G)
        R2 = ctx.g1.scalar_mul(limbs2, Q)
        R = ctx.g1.add(R1, R2)
        (rx, ry), inf = ctx.g1.to_affine(R)
        rxs = ctx.fp.decode(rx)
        if not isinstance(rxs, list):
            rxs = [rxs]
        infs = np.asarray(inf)
        return np.array([
            o and not i and (x % n) == sig[0]
            for o, i, x, sig in zip(ok, infs, rxs, sigs)])

    # -- DER codec (codecs_ecdsa.nim analogue) ------------------------------

    @staticmethod
    def sig_to_der(r: int, s: int) -> bytes:
        def enc_int(v):
            b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
            if b[0] & 0x80:
                b = b"\x00" + b
            return b"\x02" + bytes([len(b)]) + b
        body = enc_int(r) + enc_int(s)
        return b"\x30" + bytes([len(body)]) + body

    @staticmethod
    def sig_from_der(data: bytes):
        if len(data) < 8 or data[0] != 0x30 or data[1] != len(data) - 2:
            return None
        i = 2
        vals = []
        for _ in range(2):
            if data[i] != 0x02:
                return None
            ln = data[i + 1]
            vals.append(int.from_bytes(data[i + 2:i + 2 + ln], "big"))
            i += 2 + ln
        if i != len(data):
            return None
        return tuple(vals)


@functools.lru_cache(maxsize=None)
def get_ecdsa(curve: str = "Secp256k1") -> ECDSA:
    return ECDSA(curve)
