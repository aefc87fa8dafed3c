"""Symmetric primitives: SHA-256, Keccak-256, HMAC, HKDF (host-side).

Own implementations of the standard algorithms — the capability analogue of
the reference's hash stack (constantine/hashes/h_sha256.nim streaming API,
hashes/keccak/, mac/mac_hmac.nim, kdf/kdf_hkdf.nim). Protocol transcripts
(Fiat-Shamir) hash a few hundred bytes, so a host implementation is the
right tool; differential tests vs hashlib mirror the reference's
tests-vs-OpenSSL strategy (tests/t_hash_sha256_vs_openssl.nim).

A batched JAX SHA-256 for high-throughput hash_to_curve lives in
ops/sha256_jax.py (planned); this module is the protocol-edge path.
"""

from __future__ import annotations

import struct

# Host-native C++ fast path (native/libconstantine_tpu_host.so); the pure
# python below remains the reference implementation and the fallback.
try:
    from .. import native as _native
    if not _native.available():
        _native = None
except Exception:  # pragma: no cover
    _native = None

# ---------------------------------------------------------------------------
# SHA-256 (FIPS 180-4)
# ---------------------------------------------------------------------------

_K = [
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
]

_H0 = [0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
       0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19]

_M32 = 0xFFFFFFFF


def _rotr(x, n):
    return ((x >> n) | (x << (32 - n))) & _M32


class Sha256:
    """Streaming SHA-256 (update/finish API like the reference's
    hashes/h_sha256.nim:1-210)."""

    def __init__(self):
        self.h = list(_H0)
        self.buf = b""
        self.length = 0

    def update(self, data: bytes):
        self.length += len(data)
        self.buf += data
        while len(self.buf) >= 64:
            self._compress(self.buf[:64])
            self.buf = self.buf[64:]
        return self

    def _compress(self, block: bytes):
        w = list(struct.unpack(">16I", block))
        for i in range(16, 64):
            s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
            s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
            w.append((w[i - 16] + s0 + w[i - 7] + s1) & _M32)
        a, b, c, d, e, f, g, h = self.h
        for i in range(64):
            s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = (h + s1 + ch + _K[i] + w[i]) & _M32
            s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = (s0 + maj) & _M32
            h, g, f, e, d, c, b, a = g, f, e, (d + t1) & _M32, c, b, a, (t1 + t2) & _M32
        self.h = [(x + y) & _M32 for x, y in
                  zip(self.h, [a, b, c, d, e, f, g, h])]

    def digest(self) -> bytes:
        pad = b"\x80" + b"\x00" * ((55 - self.length) % 64)
        tail = struct.pack(">Q", self.length * 8)
        clone = Sha256()
        clone.h = list(self.h)
        clone.buf = self.buf
        clone.length = self.length
        # finalize on the clone without double-counting length
        data = clone.buf + pad + tail
        clone.buf = b""
        for i in range(0, len(data), 64):
            clone._compress(data[i:i + 64])
        return struct.pack(">8I", *clone.h)


def sha256(data: bytes) -> bytes:
    if _native is not None:
        return _native.sha256(data)
    return Sha256().update(data).digest()


# ---------------------------------------------------------------------------
# Keccak-256 (pre-NIST padding 0x01, as used by Ethereum)
# ---------------------------------------------------------------------------

_KECCAK_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROT = [[0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
        [28, 55, 25, 21, 56], [27, 20, 39, 8, 14]]
_M64 = (1 << 64) - 1


def _rotl64(x, n):
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _M64


def _keccak_f(st):
    for rc in _KECCAK_RC:
        # theta
        c = [st[x][0] ^ st[x][1] ^ st[x][2] ^ st[x][3] ^ st[x][4]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl64(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                st[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl64(st[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                st[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y] & _M64)
        # iota
        st[0][0] ^= rc
    return st


def keccak256(data: bytes) -> bytes:
    if _native is not None:
        return _native.keccak256(data)
    return _keccak256_py(data)


def _keccak256_py(data: bytes) -> bytes:
    """Pure-python Keccak-256 (kept callable for differential tests even
    when the native backend is loaded)."""
    rate = 136
    st = [[0] * 5 for _ in range(5)]
    # multi-rate padding pad10*1 (single 0x81 byte when padlen == 1)
    msg = bytearray(data)
    padlen = rate - (len(msg) % rate)
    pad = bytearray(padlen)
    pad[0] |= 0x01
    pad[-1] |= 0x80
    msg += pad
    for off in range(0, len(msg), rate):
        block = msg[off:off + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[8 * i:8 * i + 8], "little")
            x, y = i % 5, i // 5
            st[x][y] ^= lane
        st = _keccak_f(st)
    out = b""
    for i in range(4):  # 32 bytes
        x, y = i % 5, i // 5
        out += st[x][y].to_bytes(8, "little")
    return out


# ---------------------------------------------------------------------------
# RIPEMD-160 (ISO/IEC 10118-3) — needed by the 0x03 EVM precompile
# (reference: constantine/hashes/ripemd160 + eth_evm_ripemd160)
# ---------------------------------------------------------------------------

_RMD_R1 = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
           7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
           3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
           1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
           4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13]
_RMD_R2 = [5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
           6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
           15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
           8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
           12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11]
_RMD_S1 = [11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
           7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
           11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
           11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
           9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6]
_RMD_S2 = [8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
           9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
           9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
           15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
           8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11]
_RMD_K1 = [0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC, 0xA953FD4E]
_RMD_K2 = [0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000]


def _rmd_f(j, x, y, z):
    if j < 16:
        return x ^ y ^ z
    if j < 32:
        return ((x & y) | ((~x & _M32) & z)) & _M32
    if j < 48:
        return ((x | (~y & _M32)) ^ z) & _M32
    if j < 64:
        return ((x & z) | (y & (~z & _M32))) & _M32
    return (x ^ (y | (~z & _M32))) & _M32


def _rotl32(x, n):
    return ((x << n) | (x >> (32 - n))) & _M32


def ripemd160(data: bytes) -> bytes:
    if _native is not None:
        return _native.ripemd160(data)
    h = [0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476, 0xC3D2E1F0]
    msg = bytearray(data)
    bitlen = len(msg) * 8
    msg.append(0x80)
    while len(msg) % 64 != 56:
        msg.append(0)
    msg += struct.pack("<Q", bitlen)
    for off in range(0, len(msg), 64):
        x = struct.unpack("<16I", msg[off:off + 64])
        a1, b1, c1, d1, e1 = h
        a2, b2, c2, d2, e2 = h
        for j in range(80):
            t = (a1 + _rmd_f(j, b1, c1, d1) + x[_RMD_R1[j]]
                 + _RMD_K1[j // 16]) & _M32
            t = (_rotl32(t, _RMD_S1[j]) + e1) & _M32
            a1, e1, d1, c1, b1 = e1, d1, _rotl32(c1, 10), b1, t
            t = (a2 + _rmd_f(79 - j, b2, c2, d2) + x[_RMD_R2[j]]
                 + _RMD_K2[j // 16]) & _M32
            t = (_rotl32(t, _RMD_S2[j]) + e2) & _M32
            a2, e2, d2, c2, b2 = e2, d2, _rotl32(c2, 10), b2, t
        t = (h[1] + c1 + d2) & _M32
        h[1] = (h[2] + d1 + e2) & _M32
        h[2] = (h[3] + e1 + a2) & _M32
        h[3] = (h[4] + a1 + b2) & _M32
        h[4] = (h[0] + b1 + c2) & _M32
        h[0] = t
    return struct.pack("<5I", *h)


# ---------------------------------------------------------------------------
# HMAC / HKDF (RFC 2104 / RFC 5869) over SHA-256
# ---------------------------------------------------------------------------


def hmac_sha256(key: bytes, msg: bytes) -> bytes:
    if _native is not None:
        return _native.hmac_sha256(key, msg)
    if len(key) > 64:
        key = sha256(key)
    key = key + b"\x00" * (64 - len(key))
    o = bytes(b ^ 0x5C for b in key)
    i = bytes(b ^ 0x36 for b in key)
    return sha256(o + sha256(i + msg))


def hkdf_extract(salt: bytes, ikm: bytes) -> bytes:
    return hmac_sha256(salt, ikm)


def hkdf_expand(prk: bytes, info: bytes, length: int) -> bytes:
    out, t = b"", b""
    i = 1
    while len(out) < length:
        t = hmac_sha256(prk, t + info + bytes([i]))
        out += t
        i += 1
    return out[:length]
