"""Python facade for the native C ABI shim (native/src/ctt_protocols.cpp).

One flat function per exported C symbol, bytes-in/bytes-out, adapting the
internal batched/class APIs to the reference's C calling shapes
(include/constantine/protocols/*.h). The embedded interpreter imports ONLY
this module, keeping the C-visible contract in one reviewable place."""

from __future__ import annotations

import numpy as np


# -- trusted setup ------------------------------------------------------------


def load_trusted_setup(path: str = None):
    from .models.trusted_setup import get_settings
    if path:
        return get_settings(path) is not None
    return get_settings() is not None


# -- EIP-4844 -----------------------------------------------------------------


def blob_to_kzg_commitment(blob: bytes):
    from .models import eip4844
    return eip4844.blob_to_kzg_commitment(blob)


def compute_kzg_proof(blob: bytes, z: bytes):
    from .models import eip4844
    return eip4844.compute_kzg_proof(blob, z)


def verify_kzg_proof(commitment: bytes, z: bytes, y: bytes, proof: bytes):
    from .models import eip4844
    return eip4844.verify_kzg_proof(commitment, z, y, proof)


def compute_blob_kzg_proof(blob: bytes, commitment: bytes):
    from .models import eip4844
    return eip4844.compute_blob_kzg_proof(blob, commitment)


def verify_blob_kzg_proof(blob: bytes, commitment: bytes, proof: bytes):
    from .models import eip4844
    return eip4844.verify_blob_kzg_proof(blob, commitment, proof)


def verify_blob_kzg_proof_batch(blobs, commitments, proofs, rnd: bytes):
    from .models import eip4844
    return eip4844.verify_blob_kzg_proof_batch(
        list(blobs), list(commitments), list(proofs), rng_seed=rnd)


# -- BLS signatures -----------------------------------------------------------


def bls_verify(pubkey: bytes, message: bytes, signature: bytes):
    from .models.bls_signatures import get_bls
    out = get_bls().verify(pubkey, [message], signature)
    return bool(np.asarray(out).all())


def bls_batch_verify(pubkeys, messages, signatures, rnd: bytes):
    from .models.bls_signatures import get_bls
    return bool(get_bls().batch_verify(
        b"".join(pubkeys), list(messages), b"".join(signatures),
        secure_blinding=rnd))


# -- hash-to-curve ------------------------------------------------------------


def hash_to_g2_compressed(message: bytes, dst: bytes) -> bytes:
    from .models.hash_to_curve import get_h2c
    from .utils.serialization import get_codec
    h2c = get_h2c()
    P = h2c.hash_to_g2([message], dst)
    (x, y), inf = h2c.ctx.g2.to_affine(P)
    return get_codec().g2_compress((x, y), inf_mask=inf)


# -- EVM ----------------------------------------------------------------------


def eth_evm_modexp(calldata: bytes):
    from .models.evm_precompiles import eth_evm_modexp as f
    return f(calldata)
