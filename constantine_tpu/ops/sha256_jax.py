"""Batched SHA-256 on device (message-parallel over VPU lanes).

The lane-parallel analogue of the reference's SIMD SHA-256 backends
(constantine/hashes/sha256/sha256_x86_ssse3.nim, sha256_x86_shaext.nim,
sha256_arm64_sha2ext.nim): one compression runs 64 sequential rounds, but
N independent messages ride the batch axis, so hash_to_curve /
expand_message_xmd over many messages (BLS batch verification,
h2c_hash_to_field.nim:56 analogue) costs one device program instead of N
host-sequential hashes.

Two entry points:
  sha256_batch(msgs)                    — N arbitrary same-or-mixed-length
                                          messages -> N digests
  expand_message_xmd_batch(msgs, dst, len_in_bytes)
                                        — RFC 9380 §5.3.1, the whole
                                          b0/b1..b_ell chain in ONE jit
                                          (fixed shapes; per-message
                                          lengths may differ via block
                                          masking)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_K = np.array([
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
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

_H0 = np.array([0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19],
               dtype=np.uint32)


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def _compress(state, block):
    """state: (N, 8) u32; block: (N, 16) u32 big-endian words -> (N, 8)."""
    w = [block[:, t] for t in range(16)]
    for t in range(16, 64):
        s0 = _rotr(w[t - 15], 7) ^ _rotr(w[t - 15], 18) \
            ^ (w[t - 15] >> np.uint32(3))
        s1 = _rotr(w[t - 2], 17) ^ _rotr(w[t - 2], 19) \
            ^ (w[t - 2] >> np.uint32(10))
        w.append(w[t - 16] + s0 + w[t - 7] + s1)
    a, b, c, d, e, f, g, h = [state[:, i] for i in range(8)]
    for t in range(64):
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + np.uint32(_K[t]) + w[t]
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    return state + jnp.stack([a, b, c, d, e, f, g, h], axis=1)


def _pad_to_blocks(msgs):
    """FIPS 180-4 padding; returns (blocks (N, B, 16) u32, nblocks (N,))."""
    padded = []
    for m in msgs:
        bitlen = len(m) * 8
        m = m + b"\x80"
        m = m + b"\x00" * (-(len(m) + 8) % 64)
        m = m + bitlen.to_bytes(8, "big")
        padded.append(np.frombuffer(m, dtype=">u4").astype(np.uint32).reshape(-1, 16))
    nb = np.array([p.shape[0] for p in padded], dtype=np.int32)
    B = int(nb.max())
    out = np.zeros((len(msgs), B, 16), np.uint32)
    for i, p in enumerate(padded):
        out[i, :p.shape[0]] = p
    return out, nb


@functools.lru_cache(maxsize=None)
def _batch_fn(B: int):
    @jax.jit
    def run(blocks, nb):
        state = jnp.broadcast_to(jnp.asarray(_H0), (blocks.shape[0], 8))
        for b in range(B):
            new = _compress(state, blocks[:, b])
            state = jnp.where((nb > b)[:, None], new, state)
        return state
    return run


def sha256_batch(msgs) -> list:
    """N messages -> N 32-byte digests, one device program."""
    if not msgs:
        return []
    blocks, nb = _pad_to_blocks(msgs)
    state = _batch_fn(blocks.shape[1])(jnp.asarray(blocks), jnp.asarray(nb))
    out = np.asarray(jax.device_get(state)).astype(">u4")
    return [out[i].tobytes() for i in range(len(msgs))]


@functools.lru_cache(maxsize=None)
def _expand_fn(B: int, ell: int, suffix_blocks: int):
    @jax.jit
    def run(msg_blocks, nb, chain_template):
        """msg_blocks: (N, B, 16) of msg_prime; chain_template:
        (N, suffix_blocks, 16) of the pre-padded (b || i || dst_prime)
        block images with the 32-byte b slot zeroed (filled per round)."""
        N = msg_blocks.shape[0]
        state = jnp.broadcast_to(jnp.asarray(_H0), (N, 8))
        for b in range(B):
            new = _compress(state, msg_blocks[:, b])
            state = jnp.where((nb > b)[:, None], new, state)
        b0 = state                                   # (N, 8) words
        outs = []
        prev = jnp.zeros_like(b0)
        for i in range(1, ell + 1):
            binp = b0 ^ prev if i > 1 else b0
            st = jnp.broadcast_to(jnp.asarray(_H0), (N, 8))
            for sb in range(suffix_blocks):
                blk = chain_template[:, sb]
                if sb == 0:
                    blk = blk.at[:, :8].set(binp)
                # the round index byte i rides in the template per call —
                # patched below by adding i at its known lane
                blk = blk + _round_patch(i, sb, blk.shape)
                st = _compress(st, blk)
            prev = st
            outs.append(st)
        return jnp.stack(outs, axis=1)               # (N, ell, 8)

    def _round_patch(i, sb, shape):
        # byte position 32 of the chain message = round index; it sits in
        # word 8 of block 0, top byte
        if sb != 0:
            return jnp.zeros(shape, jnp.uint32)
        patch = np.zeros((1, 16), np.uint32)
        patch[0, 8] = i << 24
        return jnp.asarray(patch)

    return run


def expand_message_xmd_batch(msgs, dst: bytes, len_in_bytes: int) -> list:
    """RFC 9380 expand_message_xmd for N messages in ONE device program.
    Returns N byte strings of len_in_bytes."""
    assert len(dst) <= 255
    ell = -(-len_in_bytes // 32)
    assert ell <= 255
    dst_prime = dst + bytes([len(dst)])
    z_pad = bytes(64)
    lib = len_in_bytes.to_bytes(2, "big")
    primes = [z_pad + m + lib + b"\x00" + dst_prime for m in msgs]
    blocks, nb = _pad_to_blocks(primes)

    # chain message: 32 zero bytes (b slot) + 1 zero byte (round index
    # slot, patched on device) + dst_prime, FIPS-padded — identical for
    # every message and round
    chain = bytes(32) + bytes([0]) + dst_prime
    bitlen = len(chain) * 8
    chain = chain + b"\x80" + b"\x00" * (-(len(chain) + 1 + 8) % 64) \
        + bitlen.to_bytes(8, "big")
    ctpl = np.frombuffer(chain, dtype=">u4").astype(np.uint32).reshape(1, -1, 16)
    ctpl = np.broadcast_to(ctpl, (len(msgs),) + ctpl.shape[1:]).copy()

    fn = _expand_fn(blocks.shape[1], ell, ctpl.shape[1])
    out = fn(jnp.asarray(blocks), jnp.asarray(nb), jnp.asarray(ctpl))
    words = np.asarray(jax.device_get(out)).astype(">u4")   # (N, ell, 8)
    return [words[i].tobytes()[:len_in_bytes] for i in range(len(msgs))]
