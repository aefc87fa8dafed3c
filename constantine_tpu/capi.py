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


# -- EVM precompiles (full EIP-2537/196/197/198 surface) ----------------------


def eth_evm_precompile(name: str, calldata: bytes):
    """Generic dispatcher: name is the suffix of models.evm_precompiles'
    eth_evm_<name> entry points (sha256, ripemd160, modexp, bn254_g1add,
    bn254_g1mul, bn254_ecpairingcheck, bls12381_{g1add,g1msm,g2add,g2msm,
    pairingcheck,map_fp_to_g1,map_fp2_to_g2}). Returns bytes or None."""
    from .models import evm_precompiles as evm
    fn = getattr(evm, "eth_evm_" + name, None)
    if fn is None:
        return None
    return fn(calldata)


# -- PeerDAS (EIP-7594) -------------------------------------------------------


def peerdas_compute_cells_and_kzg_proofs(blob: bytes):
    """-> (cells concat 128*2048B, proofs concat 128*48B) or None."""
    from .models.peerdas import get_peerdas
    out = get_peerdas().compute_cells_and_kzg_proofs(blob)
    if out is None:
        return None
    cells, proofs = out
    return b"".join(cells), b"".join(proofs)


def peerdas_recover_cells_and_kzg_proofs(cell_indices, cells):
    """cell_indices: list[int]; cells: list of 2048B. Same packing out."""
    from .models.peerdas import get_peerdas
    out = get_peerdas().recover_cells_and_kzg_proofs(
        list(cell_indices), list(cells))
    if out is None:
        return None
    cells_o, proofs = out
    return b"".join(cells_o), b"".join(proofs)


def peerdas_verify_cell_kzg_proof_batch(commitments, cell_indices, cells,
                                        proofs):
    from .models.peerdas import get_peerdas
    return get_peerdas().verify_cell_kzg_proof_batch(
        list(commitments), list(cell_indices), list(cells), list(proofs))


# -- low-level accel surface (halo2-zal MsmAccel analogue) --------------------


def bls12381_g1_msm_uncompressed(points: bytes, scalars: bytes):
    """n 96-byte BE uncompressed G1 points (x||y, all-zero = infinity) +
    n 32-byte BE scalars -> 96-byte uncompressed sum, or None on invalid
    input. The C symbol ctt_bls12381_g1_msm binds here — the
    constantine-halo2-zal MsmAccel engine's compute kernel
    (constantine-rust/constantine-halo2-zal/src/lib.rs analogue)."""
    import jax.numpy as jnp
    from .named.precompute import get_curve
    from .ops import limbs as lb
    from .ops.msm import msm

    if len(points) % 96 or len(scalars) % 32:
        return None
    n = len(points) // 96
    if n == 0 or len(scalars) != n * 32:
        return None
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    arr = np.frombuffer(points, np.uint8).reshape(n, 2, 48)
    xs = lb.bytes_be_to_limbs(arr[:, 0].tobytes(), 48, F.L)
    ys = lb.bytes_be_to_limbs(arr[:, 1].tobytes(), 48, F.L)
    inf = (arr == 0).all(axis=(1, 2))
    xm = F.to_mont(jnp.asarray(xs))
    ym = F.to_mont(jnp.asarray(ys))
    # on-curve check (vartime, public inputs)
    P = ctx.g1.from_affine((xm, ym), inf_mask=jnp.asarray(inf))
    if not bool(np.asarray(ctx.g1.is_on_curve(P)).all()):
        return None
    sl, valid = np.asarray(lb.bytes_be_to_limbs(scalars, 32, ctx.fr.L)), True
    # scalars reduced mod r (halo2 passes field elements already < r)
    ints = [int.from_bytes(scalars[i * 32:(i + 1) * 32], "big") % ctx.r
            for i in range(n)]
    sl = np.asarray(ctx.scalars_to_limbs(ints))
    sl[np.asarray(inf)] = 0
    R = msm(ctx.g1, (xm, ym), jnp.asarray(sl), scalar_bits=255)
    (ax, ay), rinf = ctx.g1.to_affine(tuple(t[None] for t in R))
    if bool(np.asarray(rinf)[0]):
        return b"\x00" * 96
    xc = np.asarray(F.from_mont(ax))
    yc = np.asarray(F.from_mont(ay))
    return (lb.limbs_to_bytes_be(xc, 48) + lb.limbs_to_bytes_be(yc, 48))


# -- low-level per-curve API (c_curve_decls.nim analogue) ---------------------
#
# Single-element field/EC ops for the C ABI. These run on HOST integers
# (utils/refmath): a 2-element VPU launch would waste >99% of the machine
# and pay a tunnel RTT per call — exactly the shape the reference's own C
# API serves with scalar CPU code. The batched device paths (ops/, models/)
# are the performance surface; this is the compatibility surface, and both
# are differential-tested against each other in the suite.


def _ll_ctx():
    from .named.precompute import get_curve
    return get_curve("BLS12_381")


def _fp_int(b):
    v = int.from_bytes(b, "big")
    return v


def bls12381_fp_op(op: str, a: bytes, b: bytes = None):
    ctx = _ll_ctx()
    p = ctx.p
    x = _fp_int(a)
    if x >= p:
        return None
    y = None
    if b is not None:
        y = _fp_int(b)
        if y >= p:
            return None
    from .utils import refmath as rm
    if op == "add":
        r = (x + y) % p
    elif op == "sub":
        r = (x - y) % p
    elif op == "mul":
        r = (x * y) % p
    elif op == "inv":
        r = 0 if x == 0 else rm.inv_mod(x, p)
    elif op == "sqrt":
        r = rm.sqrt_mod(x, p)
        if r is None:
            return None
    else:
        return None
    return r.to_bytes(48, "big")


def bls12381_fr_op(op: str, a: bytes, b: bytes = None):
    ctx = _ll_ctx()
    r_mod = ctx.r
    x = int.from_bytes(a, "big")
    if x >= r_mod:
        return None
    y = None
    if b is not None:
        y = int.from_bytes(b, "big")
        if y >= r_mod:
            return None
    from .utils import refmath as rm
    if op == "add":
        v = (x + y) % r_mod
    elif op == "sub":
        v = (x - y) % r_mod
    elif op == "mul":
        v = (x * y) % r_mod
    elif op == "inv":
        v = 0 if x == 0 else rm.inv_mod(x, r_mod)
    else:
        return None
    return v.to_bytes(32, "big")


def _g1_from_bytes(b):
    if len(b) != 96:
        return None
    if all(c == 0 for c in b):
        return "inf"
    x = int.from_bytes(b[:48], "big")
    y = int.from_bytes(b[48:], "big")
    ctx = _ll_ctx()
    if x >= ctx.p or y >= ctx.p:
        return None
    from .utils import refmath as rm
    if not rm.ec_is_on_curve((x, y), 0, 4, ctx.p):
        return None
    return (x, y)


def _g1_to_bytes(P):
    if P is None or P == "inf":
        return b"\x00" * 96
    return P[0].to_bytes(48, "big") + P[1].to_bytes(48, "big")


def bls12381_g1_op(op: str, a: bytes, b: bytes = None):
    ctx = _ll_ctx()
    from .utils import refmath as rm
    P = _g1_from_bytes(a)
    if P is None:
        return None
    if op == "add":
        Q = _g1_from_bytes(b)
        if Q is None:
            return None
        if P == "inf":
            return _g1_to_bytes(Q)
        if Q == "inf":
            return _g1_to_bytes(P)
        return _g1_to_bytes(rm.ec_add(P, Q, 0, ctx.p))  # None = infinity
    if op == "neg":
        if P == "inf":
            return _g1_to_bytes(P)
        return _g1_to_bytes(rm.ec_neg(P, ctx.p))
    if op == "scalar_mul":
        k = int.from_bytes(b, "big") % ctx.r
        if P == "inf" or k == 0:
            return b"\x00" * 96
        return _g1_to_bytes(rm.ec_mul(k, P, 0, ctx.p))
    return None


def bls12381_g1_in_subgroup(a: bytes):
    from .utils import refmath as rm
    ctx = _ll_ctx()
    P = _g1_from_bytes(a)
    if P is None:
        return None
    if P == "inf":
        return True
    return rm.ec_mul(ctx.r, P, 0, ctx.p) is None
