"""Symmetric primitives: ChaCha20 stream cipher, Poly1305 one-time MAC,
and the OS CSPRNG.

Re-design of the reference's symmetric layer:
* ChaCha20 (RFC 8439): constantine/ciphers/chacha20.nim
* Poly1305 (RFC 8439): constantine/mac/mac_poly1305.nim
* sysrand: constantine/csprngs/sysrand.nim:162 (getrandom/arc4random) —
  here os.urandom, the same underlying kernel CSPRNG.

These are host-side primitives (key schedules, RNG seeding, MACs over
serialized transcripts); there is no batch axis in their protocol usage, so
the implementation is vectorized numpy (ChaCha20 processes all blocks of a
message at once) rather than a device kernel.
"""

from __future__ import annotations

import os
import struct

import numpy as np

# ---------------------------------------------------------------------------
# ChaCha20 (RFC 8439 §2.3-2.4) — all blocks of the message in parallel
# ---------------------------------------------------------------------------

_CONSTANTS = np.frombuffer(b"expand 32-byte k", dtype="<u4")


def _quarter_round(st, a, b, c, d):
    st[a] += st[b]; st[d] ^= st[a]; st[d] = (st[d] << 16) | (st[d] >> 16)
    st[c] += st[d]; st[b] ^= st[c]; st[b] = (st[b] << 12) | (st[b] >> 20)
    st[a] += st[b]; st[d] ^= st[a]; st[d] = (st[d] << 8) | (st[d] >> 24)
    st[c] += st[d]; st[b] ^= st[c]; st[b] = (st[b] << 7) | (st[b] >> 25)


def chacha20_block_states(key32: bytes, counter: int, nonce12: bytes,
                          nblocks: int) -> np.ndarray:
    """(16, nblocks) uint32 keystream states — every block computed
    lane-parallel across the message."""
    key = np.frombuffer(key32, dtype="<u4")
    nonce = np.frombuffer(nonce12, dtype="<u4")
    st = np.empty((16, nblocks), dtype=np.uint32)
    st[0:4] = _CONSTANTS[:, None]
    st[4:12] = key[:, None]
    st[12] = (counter + np.arange(nblocks, dtype=np.uint64)).astype(np.uint32)
    st[13:16] = nonce[:, None]
    work = st.copy()
    with np.errstate(over="ignore"):
        for _ in range(10):
            _quarter_round(work, 0, 4, 8, 12)
            _quarter_round(work, 1, 5, 9, 13)
            _quarter_round(work, 2, 6, 10, 14)
            _quarter_round(work, 3, 7, 11, 15)
            _quarter_round(work, 0, 5, 10, 15)
            _quarter_round(work, 1, 6, 11, 12)
            _quarter_round(work, 2, 7, 8, 13)
            _quarter_round(work, 3, 4, 9, 14)
        work += st
    return work


def chacha20(key: bytes, counter: int, nonce: bytes, data: bytes) -> bytes:
    """ChaCha20 encrypt/decrypt (chacha20_cipher analogue,
    ciphers/chacha20.nim). key: 32B, nonce: 12B."""
    assert len(key) == 32 and len(nonce) == 12
    n = len(data)
    if n == 0:
        return b""
    nblocks = -(-n // 64)
    states = chacha20_block_states(key, counter, nonce, nblocks)
    # (16, B) uint32 -> per-block LE byte stream
    ks = states.T.astype("<u4").tobytes()[:n]
    return (np.frombuffer(data, np.uint8)
            ^ np.frombuffer(ks, np.uint8)).tobytes()


# ---------------------------------------------------------------------------
# Poly1305 (RFC 8439 §2.5)
# ---------------------------------------------------------------------------

_P1305 = (1 << 130) - 5


def poly1305(key32: bytes, data: bytes) -> bytes:
    """One-time authenticator (mac/mac_poly1305.nim). key: 32B (r || s)."""
    assert len(key32) == 32
    r = int.from_bytes(key32[:16], "little")
    r &= 0x0FFFFFFC0FFFFFFC0FFFFFFC0FFFFFFF
    s = int.from_bytes(key32[16:], "little")
    acc = 0
    for i in range(0, len(data), 16):
        blk = data[i:i + 16]
        nval = int.from_bytes(blk, "little") + (1 << (8 * len(blk)))
        acc = (acc + nval) * r % _P1305
    return ((acc + s) & ((1 << 128) - 1)).to_bytes(16, "little")


# ---------------------------------------------------------------------------
# CSPRNG
# ---------------------------------------------------------------------------


def sysrand(nbytes: int) -> bytes:
    """OS CSPRNG (csprngs/sysrand.nim analogue): kernel entropy via
    os.urandom (getrandom(2) on Linux)."""
    return os.urandom(nbytes)
