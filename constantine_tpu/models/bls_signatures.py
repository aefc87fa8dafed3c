"""Ethereum BLS signatures (BLS12-381, G2 signatures, proof-of-possession
scheme) — batched.

Re-design of the reference's signature stack
(constantine/signatures/bls_signatures.nim:40-79 coreSign/coreVerify,
bls_signatures_parallel.nim batch verification with random blinding,
constantine/ethereum_bls_signatures.nim:114-562 public API). Scheme:
BLS_SIG_BLS12381G2_XMD:SHA-256_SSWU_RO_POP_ (pubkeys in G1, signatures in
G2, Ethereum DST).

TPU design: sign/verify are batched over messages; batch verification folds
n (pk, msg, sig) triples with random blinding factors into one 2n-pair (or
(n+1)-pair) product pairing check with a single final exponentiation.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..named.precompute import get_curve
from ..ops import limbs as lb
from ..ops.pairing import get_pairing
from ..utils.hashes import sha256
from ..utils.serialization import get_codec
from .hash_to_curve import get_h2c

DST = b"BLS_SIG_BLS12381G2_XMD:SHA-256_SSWU_RO_POP_"


class BLSSignatures:
    def __init__(self):
        self.ctx = get_curve("BLS12_381")
        self.codec = get_codec()
        self.h2c = get_h2c()
        self.pr = get_pairing("BLS12_381")

    # -- key handling -----------------------------------------------------

    def derive_pubkeys(self, secret_keys):
        """(n,) python ints -> G1 compressed pubkeys bytes (n*48,).
        (ethereum_bls_signatures.nim derive_pubkey)."""
        ctx = self.ctx
        n = len(secret_keys)
        limbs = jnp.asarray(ctx.scalars_to_limbs(secret_keys))
        G = ctx.g1.from_affine(tuple(
            jnp.broadcast_to(g, (n,) + g.shape[1:]) for g in ctx.g1_gen))
        P = ctx.g1.scalar_mul(limbs, G, scalar_bits=255)
        (x, y), inf = ctx.g1.to_affine(P)
        return self.codec.g1_compress((x, y), inf)

    # -- core sign / verify --------------------------------------------------

    def sign(self, secret_keys, msgs):
        """coreSign (bls_signatures.nim:40): sig = [sk] H(m). Batched.
        Returns compressed G2 signatures bytes (n*96,), or None if any
        secret key is invalid (0 or >= r), mirroring the reference's
        deserialize_seckey rejection (ethereum_bls_signatures.nim)."""
        ctx = self.ctx
        if any(sk <= 0 or sk >= ctx.r for sk in secret_keys):
            return None
        H = self.h2c.hash_to_g2(msgs, DST)
        limbs = jnp.asarray(ctx.scalars_to_limbs(secret_keys))
        import jax as _jax
        import os as _os
        if _jax.default_backend() != "cpu" \
                or _os.environ.get("CTT_GLS4_SIGN") == "1":
            # GLS-4 endomorphism split: four ~67-bit ladders instead of
            # one 255-bit (scalarMulEndo m=4, ec_scalar_mul.nim:267).
            # Accelerator-only: on the CPU test backend the extra program
            # size aggravates the known XLA-CPU LLVM segfault.
            from ..ops.glv import scalar_mul_gls4_g2
            (hx, hy), hinf = ctx.g2.to_affine(H)
            S = scalar_mul_gls4_g2(ctx, limbs, (hx, hy))
            S = ctx.g2.select(hinf, ctx.g2.infinity(hinf.shape), S)
        else:
            S = ctx.g2.scalar_mul(limbs, H, scalar_bits=255)
        (x, y), inf = ctx.g2.to_affine(S)
        return self.codec.g2_compress((x, y), inf)

    def verify(self, pubkeys: bytes, msgs, signatures: bytes):
        """coreVerify (bls_signatures.nim:79) batched independently:
        e(pk, H(m)) == e(G1, sig)  for each triple. Returns (n,) bool array
        (False also for malformed/infinity inputs, matching the reference's
        status-code rejections)."""
        ctx = self.ctx
        n = len(msgs)
        if n == 0 or len(pubkeys) != 48 * n or len(signatures) != 96 * n:
            return np.zeros(n, dtype=bool)
        (pkx, pky), pk_inf, pk_ok = self.codec.g1_decompress(pubkeys)
        (sx, sy), s_inf, s_ok = self.codec.g2_decompress(signatures)
        H = self.h2c.hash_to_g2(msgs, DST)
        (hx, hy), h_inf = ctx.g2.to_affine(H)

        # check e(pk, H(m)) * e(-G1, sig) == 1 per triple via a batch-2
        # multi-pairing per element: arrange pairs [pk_i, -G1] x [H_i, sig_i]
        g1x, g1y = ctx.g1_gen
        negg1y = ctx.fp.neg(g1y)
        P = (jnp.concatenate([pkx, jnp.broadcast_to(g1x, (n,) + g1x.shape[1:])]),
             jnp.concatenate([pky, jnp.broadcast_to(negg1y, (n,) + negg1y.shape[1:])]))
        Q = (jnp.concatenate([hx, sx]), jnp.concatenate([hy, sy]))
        fs = self.pr.miller_loop(P, Q)
        f = self.pr.fp12.mul(fs[:n], fs[n:])
        gt = self.pr.final_exp(f)
        ok = self.pr.fp12.eq(gt, self.pr.fp12.broadcast_one((n,)))
        valid = (np.asarray(ok) & np.asarray(pk_ok) & np.asarray(s_ok)
                 & ~np.asarray(pk_inf) & ~np.asarray(s_inf))
        return valid

    def aggregate_signatures(self, signatures: bytes) -> bytes:
        """Aggregate n G2 signatures into one (sum)."""
        ctx = self.ctx
        if len(signatures) == 0 or len(signatures) % 96 != 0:
            return None
        (sx, sy), s_inf, s_ok = self.codec.g2_decompress(signatures)
        if not np.asarray(s_ok).all():
            return None
        S = ctx.g2.from_affine((sx, sy), inf_mask=jnp.asarray(s_inf))
        agg = _tree_sum_points(ctx.g2, S)
        (x, y), inf = ctx.g2.to_affine(tuple(t[None] for t in agg))
        return self.codec.g2_compress((x, y), np.asarray(inf))

    def fast_aggregate_verify(self, pubkeys: bytes, msg: bytes,
                              signature: bytes) -> bool:
        """n pubkeys, ONE message, one aggregated signature
        (ethereum_bls_signatures.nim fast_aggregate_verify)."""
        ctx = self.ctx
        if len(pubkeys) == 0:
            return False
        (px, py), p_inf, p_ok = self.codec.g1_decompress(pubkeys)
        if not np.asarray(p_ok).all() or np.asarray(p_inf).any():
            return False
        P = ctx.g1.from_affine((px, py))
        agg = _tree_sum_points(ctx.g1, P)
        (ax, ay), ainf = ctx.g1.to_affine(tuple(t[None] for t in agg))
        if bool(np.asarray(ainf)[0]):
            return False
        agg_pk = self.codec.g1_compress((ax, ay))
        return bool(self.verify(agg_pk, [msg], signature)[0])

    def aggregate_verify(self, pubkeys: bytes, msgs, signature: bytes) -> bool:
        """n pubkeys, n distinct messages, one aggregated signature:
        prod_i e(pk_i, H(m_i)) == e(G1, sig)."""
        ctx = self.ctx
        n = len(msgs)
        if n == 0 or len(pubkeys) != 48 * n or len(signature) != 96:
            return False
        (px, py), p_inf, p_ok = self.codec.g1_decompress(pubkeys)
        (sx, sy), s_inf, s_ok = self.codec.g2_decompress(signature)
        if not (np.asarray(p_ok).all() and np.asarray(s_ok).all()):
            return False
        if np.asarray(p_inf).any() or np.asarray(s_inf).any():
            return False
        H = self.h2c.hash_to_g2(msgs, DST)
        (hx, hy), h_inf = ctx.g2.to_affine(H)
        g1x, g1y = ctx.g1_gen
        negy = ctx.fp.neg(g1y)
        P = (jnp.concatenate([px, g1x]), jnp.concatenate([py, negy]))
        Q = (jnp.concatenate([hx, sx]), jnp.concatenate([hy, sy]))
        return bool(np.asarray(self.pr.pairing_check(P, Q)))

    def batch_verify(self, pubkeys: bytes, msgs, signatures: bytes,
                     secure_blinding: bytes = None) -> bool:
        """n independent (pk, msg, sig) triples, one check with random
        blinding (bls_signatures.nim batchVerify + parallel variant):
            prod_i e([b_i]pk_i, H(m_i)) * e(-G1, sum_i [b_i] sig_i) == 1
        """
        ctx = self.ctx
        n = len(msgs)
        if n == 0 or len(pubkeys) != 48 * n or len(signatures) != 96 * n:
            return False
        (px, py), p_inf, p_ok = self.codec.g1_decompress(pubkeys)
        (sx, sy), s_inf, s_ok = self.codec.g2_decompress(signatures)
        if not (np.asarray(p_ok).all() and np.asarray(s_ok).all()):
            return False
        if np.asarray(p_inf).any() or np.asarray(s_inf).any():
            return False
        seed = secure_blinding or os.urandom(32)
        blinds = []
        for i in range(n):
            b = int.from_bytes(
                sha256(seed + i.to_bytes(8, "big") + b"blind"), "big")
            blinds.append((b % (1 << 128)) | 1)  # 128-bit nonzero blinding
        limbs = jnp.asarray(ctx.scalars_to_limbs(blinds))
        Ppk = ctx.g1.from_affine((px, py))
        bPk = ctx.g1.scalar_mul(limbs, Ppk, scalar_bits=128)
        (bx, by), binf = ctx.g1.to_affine(bPk)
        Sig = ctx.g2.from_affine((sx, sy))
        bSig = ctx.g2.scalar_mul(limbs, Sig, scalar_bits=128)
        aggS = _tree_sum_points(ctx.g2, bSig)
        (asx, asy), asinf = ctx.g2.to_affine(tuple(t[None] for t in aggS))
        H = self.h2c.hash_to_g2(msgs, DST)
        (hx, hy), h_inf = ctx.g2.to_affine(H)
        g1x, g1y = ctx.g1_gen
        negy = ctx.fp.neg(g1y)
        P = (jnp.concatenate([bx, g1x]), jnp.concatenate([by, negy]))
        Q = (jnp.concatenate([hx, asx]), jnp.concatenate([hy, asy]))
        skip = jnp.concatenate([binf, asinf])
        return bool(np.asarray(self.pr.pairing_check(P, Q, skip_mask=skip)))


def _tree_sum_points(group, P):
    """Log-depth sum of a (n, ...) stack of Jacobian points."""
    n = P[0].shape[0]
    while n > 1:
        h = n // 2
        a = tuple(t[:h] for t in P)
        b = tuple(t[h:2 * h] for t in P)
        red = group.add(a, b)
        if n % 2:
            red = tuple(jnp.concatenate([r, t[2 * h:]], axis=0)
                        for r, t in zip(red, P))
        P = red
        n = h + (n % 2)
    return tuple(t[0] for t in P)


@functools.lru_cache(maxsize=None)
def get_bls() -> BLSSignatures:
    return BLSSignatures()
