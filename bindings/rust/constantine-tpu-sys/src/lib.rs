//! Raw FFI declarations mirroring native/include/constantine_tpu_protocols.h
//! — the counterpart of the reference's constantine-sys crate
//! (constantine-rust/constantine-sys/src/bindings64.rs).
//!
//! The runtime embeds CPython; set PYTHONPATH so the embedded interpreter
//! can import `constantine_tpu` (see the C header's deployment note).
#![allow(non_camel_case_types)]

use core::ffi::{c_char, c_int};

#[repr(C)]
pub struct ctt_eth_kzg_context {
    _private: [u8; 0],
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct ctt_eth_kzg_commitment {
    pub raw: [u8; 48],
}
#[repr(C)]
#[derive(Clone, Copy)]
pub struct ctt_eth_kzg_proof {
    pub raw: [u8; 48],
}
#[repr(C)]
#[derive(Clone, Copy)]
pub struct ctt_eth_kzg_blob {
    pub raw: [u8; 4096 * 32],
}
#[repr(C)]
#[derive(Clone, Copy)]
pub struct ctt_eth_kzg_opening_challenge {
    pub raw: [u8; 32],
}
#[repr(C)]
#[derive(Clone, Copy)]
pub struct ctt_eth_kzg_eval_at_challenge {
    pub raw: [u8; 32],
}

#[repr(C)]
#[derive(Clone, Copy, PartialEq, Eq, Debug)]
pub enum ctt_eth_kzg_status {
    cttEthKzg_Success = 0,
    cttEthKzg_VerificationFailure,
    cttEthKzg_InputsLengthsMismatch,
    cttEthKzg_ScalarZero,
    cttEthKzg_ScalarLargerThanCurveOrder,
    cttEthKzg_EccInvalidEncoding,
    cttEthKzg_EccCoordinateGreaterThanOrEqualModulus,
    cttEthKzg_EccPointNotOnCurve,
    cttEthKzg_EccPointNotInSubgroup,
    cttEthKzg_RuntimeError,
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct ctt_eth_bls_pubkey {
    pub raw: [u8; 48],
}
#[repr(C)]
#[derive(Clone, Copy)]
pub struct ctt_eth_bls_signature {
    pub raw: [u8; 96],
}

#[repr(C)]
#[derive(Clone, Copy)]
pub struct ctt_eth_kzg_cell {
    pub raw: [u8; 2048],
}

#[repr(C)]
#[derive(Clone, Copy, PartialEq, Eq, Debug)]
pub enum ctt_eth_bls_status {
    cttEthBls_Success = 0,
    cttEthBls_VerificationFailure,
    cttEthBls_InputsLengthsMismatch,
    cttEthBls_PointAtInfinity,
    cttEthBls_EccInvalidEncoding,
    cttEthBls_EccPointNotOnCurve,
    cttEthBls_EccPointNotInSubgroup,
    cttEthBls_RuntimeError,
}

extern "C" {
    pub fn ctt_eth_trusted_setup_load(filepath: *const c_char)
        -> *mut ctt_eth_kzg_context;
    pub fn ctt_eth_trusted_setup_delete(ctx: *mut ctt_eth_kzg_context);

    pub fn ctt_eth_kzg_blob_to_kzg_commitment(
        ctx: *const ctt_eth_kzg_context,
        dst: *mut ctt_eth_kzg_commitment,
        blob: *const ctt_eth_kzg_blob,
    ) -> ctt_eth_kzg_status;

    pub fn ctt_eth_kzg_compute_kzg_proof(
        ctx: *const ctt_eth_kzg_context,
        proof: *mut ctt_eth_kzg_proof,
        y: *mut ctt_eth_kzg_eval_at_challenge,
        blob: *const ctt_eth_kzg_blob,
        z: *const ctt_eth_kzg_opening_challenge,
    ) -> ctt_eth_kzg_status;

    pub fn ctt_eth_kzg_verify_kzg_proof(
        ctx: *const ctt_eth_kzg_context,
        commitment: *const ctt_eth_kzg_commitment,
        z: *const ctt_eth_kzg_opening_challenge,
        y: *const ctt_eth_kzg_eval_at_challenge,
        proof: *const ctt_eth_kzg_proof,
    ) -> ctt_eth_kzg_status;

    pub fn ctt_eth_kzg_compute_blob_kzg_proof(
        ctx: *const ctt_eth_kzg_context,
        proof: *mut ctt_eth_kzg_proof,
        blob: *const ctt_eth_kzg_blob,
        commitment: *const ctt_eth_kzg_commitment,
    ) -> ctt_eth_kzg_status;

    pub fn ctt_eth_kzg_verify_blob_kzg_proof(
        ctx: *const ctt_eth_kzg_context,
        blob: *const ctt_eth_kzg_blob,
        commitment: *const ctt_eth_kzg_commitment,
        proof: *const ctt_eth_kzg_proof,
    ) -> ctt_eth_kzg_status;

    pub fn ctt_eth_kzg_verify_blob_kzg_proof_batch(
        ctx: *const ctt_eth_kzg_context,
        blobs: *const ctt_eth_kzg_blob,
        commitments: *const ctt_eth_kzg_commitment,
        proofs: *const ctt_eth_kzg_proof,
        n: usize,
        secure_random_bytes: *const u8,
    ) -> ctt_eth_kzg_status;

    pub fn ctt_eth_bls_verify(
        pubkey: *const ctt_eth_bls_pubkey,
        message: *const u8,
        message_len: usize,
        signature: *const ctt_eth_bls_signature,
    ) -> ctt_eth_bls_status;

    pub fn ctt_eth_bls_batch_verify(
        pubkeys: *const ctt_eth_bls_pubkey,
        messages: *const *const u8,
        message_lens: *const usize,
        signatures: *const ctt_eth_bls_signature,
        n: usize,
        secure_random_bytes: *const u8,
    ) -> ctt_eth_bls_status;

    pub fn ctt_bls12381_g2_hash_to_curve(
        out: *mut u8,
        message: *const u8,
        message_len: usize,
        dst: *const u8,
        dst_len: usize,
    ) -> c_int;

    pub fn ctt_eth_evm_modexp(
        out: *mut u8,
        out_len: usize,
        calldata: *const u8,
        calldata_len: usize,
    ) -> c_int;

    // EVM precompiles (EIP-196/197/2537 surface)
    pub fn ctt_eth_evm_sha256(out: *mut u8, input: *const u8, len: usize) -> c_int;
    pub fn ctt_eth_evm_ripemd160(out: *mut u8, input: *const u8, len: usize) -> c_int;
    pub fn ctt_eth_evm_bn254_g1add(out: *mut u8, input: *const u8, len: usize) -> c_int;
    pub fn ctt_eth_evm_bn254_g1mul(out: *mut u8, input: *const u8, len: usize) -> c_int;
    pub fn ctt_eth_evm_bn254_ecpairingcheck(out: *mut u8, input: *const u8, len: usize) -> c_int;
    pub fn ctt_eth_evm_bls12381_g1add(out: *mut u8, input: *const u8, len: usize) -> c_int;
    pub fn ctt_eth_evm_bls12381_g1msm(out: *mut u8, input: *const u8, len: usize) -> c_int;
    pub fn ctt_eth_evm_bls12381_g2add(out: *mut u8, input: *const u8, len: usize) -> c_int;
    pub fn ctt_eth_evm_bls12381_g2msm(out: *mut u8, input: *const u8, len: usize) -> c_int;
    pub fn ctt_eth_evm_bls12381_pairingcheck(out: *mut u8, input: *const u8, len: usize) -> c_int;
    pub fn ctt_eth_evm_bls12381_map_fp_to_g1(out: *mut u8, input: *const u8, len: usize) -> c_int;
    pub fn ctt_eth_evm_bls12381_map_fp2_to_g2(out: *mut u8, input: *const u8, len: usize) -> c_int;

    // low-level acceleration (halo2-zal MsmAccel engine)
    pub fn ctt_bls12381_g1_msm(
        out: *mut u8,
        points: *const u8,
        scalars: *const u8,
        n: usize,
    ) -> c_int;

    // EIP-7594 PeerDAS
    pub fn ctt_eth_peerdas_compute_cells_and_kzg_proofs(
        ctx: *const ctt_eth_kzg_context,
        cells: *mut ctt_eth_kzg_cell,
        proofs: *mut ctt_eth_kzg_proof,
        blob: *const ctt_eth_kzg_blob,
    ) -> ctt_eth_kzg_status;
    pub fn ctt_eth_peerdas_recover_cells_and_kzg_proofs(
        ctx: *const ctt_eth_kzg_context,
        cells_out: *mut ctt_eth_kzg_cell,
        proofs_out: *mut ctt_eth_kzg_proof,
        cell_indices: *const u64,
        cells: *const ctt_eth_kzg_cell,
        n: usize,
    ) -> ctt_eth_kzg_status;
    pub fn ctt_eth_peerdas_verify_cell_kzg_proof_batch(
        ctx: *const ctt_eth_kzg_context,
        commitments: *const ctt_eth_kzg_commitment,
        cell_indices: *const u64,
        cells: *const ctt_eth_kzg_cell,
        proofs: *const ctt_eth_kzg_proof,
        n: usize,
    ) -> ctt_eth_kzg_status;
}
