"""EIP-4844 (Deneb) KZG protocol: blob commitments and proofs.

Re-design of the reference's protocol layer
(constantine/ethereum_eip4844_kzg.nim:126-487: fiatShamirChallenge,
blob_to_bigint_polynomial:207, blob_to_kzg_commitment:297,
compute_kzg_proof:332, verify_kzg_proof:380, compute_blob_kzg_proof:409,
verify_blob_kzg_proof:449, verify_blob_kzg_proof_batch:487). The byte-level
Fiat-Shamir transcript layout follows the Ethereum consensus spec
(deneb/polynomial-commitments.md); bit-exactness is gated on the 253 Deneb
YAML vectors (tests/protocol_ethereum_eip4844_deneb_kzg in the reference).

Status handling: functions return None on invalid input (the analogue of the
reference's cttEthKzg status enum) — the consensus vectors exercise every
rejection branch.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import limbs as lb
from ..utils.hashes import sha256
from ..utils.serialization import get_codec
from .kzg import KZG, get_kzg
from .trusted_setup import FIELD_ELEMENTS_PER_BLOB

BYTES_PER_FIELD_ELEMENT = 32
BYTES_PER_BLOB = BYTES_PER_FIELD_ELEMENT * FIELD_ELEMENTS_PER_BLOB
FIAT_SHAMIR_PROTOCOL_DOMAIN = b"FSBLOBVERIFY_V1_"
RANDOM_CHALLENGE_KZG_BATCH_DOMAIN = b"RCKZGBATCH___V1_"


# -- blob <-> polynomial ------------------------------------------------------


def blob_to_polynomial(blob: bytes):
    """Blob -> (canonical Fr limbs (4096, L), valid). The blob IS the
    evaluation form in brp order (blob_to_bigint_polynomial analogue,
    ethereum_eip4844_kzg.nim:207: each 32-byte chunk must be canonical)."""
    if blob is None or len(blob) != BYTES_PER_BLOB:
        return None, False
    codec = get_codec()
    limbs, valid = codec.scalars_from_bytes(blob)
    return limbs, bool(valid.all())


def _fr_bytes_to_mont(data: bytes):
    """32-byte BE scalar -> (Montgomery (L,), valid)."""
    if data is None or len(data) != BYTES_PER_FIELD_ELEMENT:
        return None, False
    codec = get_codec()
    limbs, valid = codec.scalars_from_bytes(data)
    if not valid.all():
        return None, False
    fr = codec.fr
    return fr.to_mont(jnp.asarray(limbs[0])), True


def _fr_mont_to_bytes(y_mont) -> bytes:
    codec = get_codec()
    y = np.asarray(jax.device_get(codec.fr.from_mont(y_mont)))
    return lb.limbs_to_bytes_be(y[None] if y.ndim == 1 else y, 32)


def _point_to_bytes(kzg: KZG, P) -> bytes:
    """Jacobian point -> 48 compressed bytes: ONE device dispatch + ONE
    device_get (kzg.export_g1 packs everything) + host byte assembly."""
    codec = get_codec()
    xc, big, inf = KZG.unpack_export(jax.device_get(kzg.export_g1(P)))
    return codec.g1_compress_canonical(xc, big, inf)


# -- Fiat-Shamir --------------------------------------------------------------


def hash_to_bls_field(data: bytes):
    """sha256(data) interpreted big-endian mod r -> Montgomery scalar."""
    codec = get_codec()
    v = int.from_bytes(sha256(data), "big") % codec.ctx.r
    return jnp.asarray(codec.fr.encode([v])[0])


def compute_challenge(blob: bytes, commitment: bytes):
    """Deneb compute_challenge: sha256(domain || degree_le16 || blob ||
    commitment) mod r (fiatShamirChallenge, ethereum_eip4844_kzg.nim:126)."""
    degree = FIELD_ELEMENTS_PER_BLOB.to_bytes(16, "big")
    return hash_to_bls_field(
        FIAT_SHAMIR_PROTOCOL_DOMAIN + degree + blob + commitment)


# -- public protocol API -------------------------------------------------------


def blob_to_kzg_commitment(blob: bytes, kzg: KZG = None):
    """-> 48-byte commitment, or None on invalid blob
    (ethereum_eip4844_kzg.nim:297)."""
    kzg = kzg or get_kzg()
    poly, ok = blob_to_polynomial(blob)
    if not ok:
        return None
    codec = get_codec()
    xc, big, inf = KZG.unpack_export(
        jax.device_get(kzg.commit_export(jnp.asarray(poly))))
    return codec.g1_compress_canonical(xc, big, inf)


def blob_to_kzg_commitment_batch(blobs, kzg: KZG = None):
    """Batched commit: B blobs -> B 48-byte commitments in ONE device
    round trip (parallel-variant parity, ethereum_eip4844_kzg_parallel.nim:
    125 blob_to_kzg_commitment_parallel). Returns None on any invalid
    blob."""
    kzg = kzg or get_kzg()
    polys = []
    for blob in blobs:
        poly, ok = blob_to_polynomial(blob)
        if not ok:
            return None
        polys.append(poly)
    if not polys:
        return []
    codec = get_codec()
    packed = jax.device_get(
        kzg.commit_batch_export(jnp.asarray(np.stack(polys))))
    xc, big, inf = KZG.unpack_export(packed)
    out = codec.g1_compress_canonical(xc, big, inf)
    return [out[i * 48:(i + 1) * 48] for i in range(len(blobs))]


def compute_kzg_proof(blob: bytes, z_bytes: bytes, kzg: KZG = None):
    """-> (48-byte proof, 32-byte y), or None (ethereum_eip4844_kzg.nim:332)."""
    kzg = kzg or get_kzg()
    poly, ok = blob_to_polynomial(blob)
    if not ok:
        return None
    z_mont, ok = _fr_bytes_to_mont(z_bytes)
    if not ok:
        return None
    evals_mont = kzg.fr.to_mont(jnp.asarray(poly))
    codec = get_codec()
    packed = jax.device_get(kzg.prove_export(evals_mont, z_mont))
    xc, big, inf = KZG.unpack_export(packed[:1])
    y_canon = packed[1, :kzg.fr.L]
    return (codec.g1_compress_canonical(xc, big, inf),
            lb.limbs_to_bytes_be(np.asarray(y_canon)[None], 32))


def compute_blob_kzg_proof(blob: bytes, commitment_bytes: bytes,
                           kzg: KZG = None):
    """-> 48-byte proof, or None (ethereum_eip4844_kzg.nim:409)."""
    kzg = kzg or get_kzg()
    poly, ok = blob_to_polynomial(blob)
    if not ok:
        return None
    if not _validate_g1_bytes(commitment_bytes):
        return None
    z = compute_challenge(blob, commitment_bytes)
    evals_mont = kzg.fr.to_mont(jnp.asarray(poly))
    codec = get_codec()
    packed = jax.device_get(kzg.prove_export(evals_mont, z))
    xc, big, inf = KZG.unpack_export(packed[:1])
    return codec.g1_compress_canonical(xc, big, inf)


def _validate_g1_bytes(data: bytes) -> bool:
    if len(data) != 48:
        return False
    codec = get_codec()
    _, _, valid = codec.g1_decompress(data, subgroup_check=True)
    return bool(np.asarray(valid).all())


def _use_fused() -> bool:
    """Fused single-dispatch verify kernels (Pallas pairing) on
    accelerators; the XLA tower path on CPU (tests) where interpret-mode
    Pallas pairing compile cost would dominate. CTT_FUSED_VERIFY=0/1
    overrides."""
    import os
    env = os.environ.get("CTT_FUSED_VERIFY")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "cpu"


def _parse_scalar_host(data: bytes):
    """32-byte BE scalar -> ((L,) canonical np limbs, valid) — host only."""
    if data is None or len(data) != BYTES_PER_FIELD_ELEMENT:
        return None, False
    codec = get_codec()
    limbs, valid = codec.scalars_from_bytes(data)
    return limbs[0], bool(valid.all())


def verify_kzg_proof(commitment_bytes: bytes, z_bytes: bytes, y_bytes: bytes,
                     proof_bytes: bytes, kzg: KZG = None):
    """-> bool, or None on malformed input (ethereum_eip4844_kzg.nim:380).
    Pairing check: e(P - [y]G1, G2) == e(proof, [tau]G2 - [z]G2).

    ONE device dispatch: decompress (sqrt + subgroup), fixed-base scalar
    muls, affine conversions and the fused Pallas pairing check all trace
    into verify_fused.FusedVerifier.verify_kernel."""
    kzg = kzg or get_kzg()
    if (commitment_bytes is None or len(commitment_bytes) != 48
            or proof_bytes is None or len(proof_bytes) != 48):
        return None
    if not _use_fused():
        return _verify_kzg_proof_xla(commitment_bytes, z_bytes, y_bytes,
                                     proof_bytes, kzg)
    from .verify_fused import get_verifier, parse_g1_host
    cx, csign, cinf, chost = parse_g1_host(commitment_bytes)
    px, psign, pinf, phost = parse_g1_host(proof_bytes)
    z_l, ok1 = _parse_scalar_host(z_bytes)
    y_l, ok2 = _parse_scalar_host(y_bytes)
    if not (ok1 and ok2):
        return None
    v = get_verifier()
    out = np.asarray(jax.device_get(v.verify_kernel(
        jnp.asarray(cx), jnp.asarray(csign), jnp.asarray(cinf),
        jnp.asarray(px), jnp.asarray(psign), jnp.asarray(pinf),
        jnp.asarray(z_l), jnp.asarray(y_l))))
    if not (chost.all() and phost.all() and out[1] and out[2]):
        return None
    return bool(out[0])


def _verify_kzg_proof_xla(commitment_bytes, z_bytes, y_bytes, proof_bytes,
                          kzg=None):
    """Pre-fusion path (XLA tower pairing) — kept as the CPU/test backend."""
    kzg = kzg or get_kzg()
    from .pairing_check import kzg_pairing_verify
    codec = get_codec()
    (cx, cy), cinf, cok = codec.g1_decompress(commitment_bytes)
    (px, py), pinf, pok = codec.g1_decompress(proof_bytes)
    if not (np.asarray(cok).all() and np.asarray(pok).all()):
        return None
    z_mont, ok1 = _fr_bytes_to_mont(z_bytes)
    y_mont, ok2 = _fr_bytes_to_mont(y_bytes)
    if not (ok1 and ok2):
        return None
    return kzg_pairing_verify(kzg, (cx, cy, cinf), (px, py, pinf),
                              z_mont, y_mont)


def verify_blob_kzg_proof(blob: bytes, commitment_bytes: bytes,
                          proof_bytes: bytes, kzg: KZG = None):
    """-> bool or None (ethereum_eip4844_kzg.nim:449). One device
    dispatch: barycentric eval + decompress + fused pairing check."""
    kzg = kzg or get_kzg()
    poly, ok = blob_to_polynomial(blob)
    if not ok:
        return None
    if len(commitment_bytes) != 48 or len(proof_bytes) != 48:
        return None
    if not _use_fused():
        z = compute_challenge(blob, commitment_bytes)
        evals_mont = kzg.fr.to_mont(jnp.asarray(poly))
        y, _hit, _ = kzg.eval_at(evals_mont, z)
        return _verify_kzg_proof_xla(commitment_bytes,
                                     _fr_mont_to_bytes(z),
                                     _fr_mont_to_bytes(y),
                                     proof_bytes, kzg)
    from .verify_fused import get_verifier, parse_g1_host
    cx, csign, cinf, chost = parse_g1_host(commitment_bytes)
    px, psign, pinf, phost = parse_g1_host(proof_bytes)
    codec = get_codec()
    z_int = int.from_bytes(
        sha256(FIAT_SHAMIR_PROTOCOL_DOMAIN
               + FIELD_ELEMENTS_PER_BLOB.to_bytes(16, "big")
               + blob + commitment_bytes), "big") % codec.ctx.r
    z_l = lb.int_to_limbs(z_int, codec.fr.L)
    v = get_verifier()
    out = np.asarray(jax.device_get(v.verify_blob_kernel(
        jnp.asarray(poly), jnp.asarray(z_l),
        jnp.asarray(cx), jnp.asarray(csign), jnp.asarray(cinf),
        jnp.asarray(px), jnp.asarray(psign), jnp.asarray(pinf))))
    if not (chost.all() and phost.all() and out[1] and out[2]):
        return None
    return bool(out[0])


def verify_blob_kzg_proof_batch(blobs, commitments, proofs, kzg: KZG = None,
                                rng_seed: bytes = b"\x00" * 32):
    """Batch verification with random linear combination
    (ethereum_eip4844_kzg.nim:487, verify_blob_kzg_proof_batch spec).
    blobs/commitments/proofs: equal-length lists. -> bool or None."""
    kzg = kzg or get_kzg()
    if not (len(blobs) == len(commitments) == len(proofs)):
        return None
    if len(blobs) == 0:
        return True
    if not _use_fused():
        return _verify_blob_kzg_proof_batch_xla(blobs, commitments, proofs,
                                                kzg)
    from .verify_fused import get_verifier, parse_g1_host
    codec = get_codec()
    polys, zs = [], []
    if any(p is None or len(p) != 48 for p in proofs):
        return None
    for blob, c in zip(blobs, commitments):
        poly, ok = blob_to_polynomial(blob)
        if not ok:
            return None
        if c is None or len(c) != 48:
            return None
        polys.append(poly)
        z_int = int.from_bytes(
            sha256(FIAT_SHAMIR_PROTOCOL_DOMAIN
                   + FIELD_ELEMENTS_PER_BLOB.to_bytes(16, "big")
                   + blob + c), "big") % codec.ctx.r
        zs.append(lb.int_to_limbs(z_int, codec.fr.L))
    cx, csign, cinf, chost = parse_g1_host(b"".join(commitments))
    px, psign, pinf, phost = parse_g1_host(b"".join(proofs))
    # batch randomness: r_powers from sha256 transcript (spec
    # compute_powers path)
    n = len(blobs)
    data = (RANDOM_CHALLENGE_KZG_BATCH_DOMAIN
            + FIELD_ELEMENTS_PER_BLOB.to_bytes(8, "big")
            + n.to_bytes(8, "big"))
    for blob, c, p in zip(blobs, commitments, proofs):
        data += blob + c + p
    r = int.from_bytes(sha256(data), "big") % kzg.ctx.r
    r_powers = [pow(r, i, kzg.ctx.r) for i in range(n)]
    # ONE device program: every blob's barycentric eval, every point
    # decompression, the random-linear-combination MSM fold and the
    # 2-pairing check trace into verify_batch_kernel.
    v = get_verifier()
    out = np.asarray(jax.device_get(v.verify_batch_kernel(
        jnp.asarray(np.stack(polys)), jnp.asarray(np.stack(zs)),
        jnp.asarray(cx), jnp.asarray(csign), jnp.asarray(cinf),
        jnp.asarray(px), jnp.asarray(psign), jnp.asarray(pinf),
        jnp.asarray(kzg.fr.encode(r_powers)))))
    if not (chost.all() and phost.all() and out[1] and out[2]):
        return None
    return bool(out[0])


def _verify_blob_kzg_proof_batch_xla(blobs, commitments, proofs, kzg=None):
    """Pre-fusion batch path (XLA tower pairing) — CPU/test backend."""
    kzg = kzg or get_kzg()
    from .pairing_check import kzg_pairing_verify_batch
    codec = get_codec()
    polys, zs = [], []
    for blob, c in zip(blobs, commitments):
        poly, _ = blob_to_polynomial(blob)
        polys.append(poly)
        zs.append(compute_challenge(blob, c))
    evals_mont = kzg.fr.to_mont(jnp.asarray(np.stack(polys)))
    zs_j = jnp.stack([jnp.asarray(z) for z in zs])
    ys_j, _, _ = jax.vmap(kzg.eval_at)(evals_mont, zs_j)
    (cx, cy), cinf, cok = codec.g1_decompress(b"".join(commitments))
    (px, py), pinf, pok = codec.g1_decompress(b"".join(proofs))
    if not (np.asarray(cok).all() and np.asarray(pok).all()):
        return None
    n = len(blobs)
    data = (RANDOM_CHALLENGE_KZG_BATCH_DOMAIN
            + FIELD_ELEMENTS_PER_BLOB.to_bytes(8, "big")
            + n.to_bytes(8, "big"))
    for blob, c, p in zip(blobs, commitments, proofs):
        data += blob + c + p
    r = int.from_bytes(sha256(data), "big") % kzg.ctx.r
    r_powers = [pow(r, i, kzg.ctx.r) for i in range(n)]
    return kzg_pairing_verify_batch(
        kzg, (cx, cy, cinf), (px, py, pinf),
        zs_j, ys_j,
        jnp.asarray(kzg.fr.encode(r_powers)))
