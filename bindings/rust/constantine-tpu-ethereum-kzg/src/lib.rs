//! Safe EIP-4844 KZG wrapper — the API shape of the reference's
//! constantine-rust/constantine-ethereum-kzg/src/lib.rs:37 (EthKzgContext
//! with load_trusted_setup + the five protocol entry points + batch).
//! The threadpool knob of the reference (`set_threadpool`) has no
//! counterpart: parallelism lives inside the TPU runtime.

use constantine_tpu_sys as sys;
use std::ffi::CString;
use std::path::Path;

pub const BYTES_PER_BLOB: usize = 4096 * 32;

#[derive(Debug, Clone, Copy, PartialEq, Eq)]
pub enum KzgError {
    VerificationFailure,
    InvalidInput(sys::ctt_eth_kzg_status),
    SetupLoadFailed,
}

pub struct EthKzgContext {
    ctx: *mut sys::ctt_eth_kzg_context,
}

unsafe impl Send for EthKzgContext {}
unsafe impl Sync for EthKzgContext {}

impl Drop for EthKzgContext {
    fn drop(&mut self) {
        unsafe { sys::ctt_eth_trusted_setup_delete(self.ctx) }
    }
}

fn status(s: sys::ctt_eth_kzg_status) -> Result<(), KzgError> {
    use sys::ctt_eth_kzg_status::*;
    match s {
        cttEthKzg_Success => Ok(()),
        cttEthKzg_VerificationFailure => Err(KzgError::VerificationFailure),
        other => Err(KzgError::InvalidInput(other)),
    }
}

impl EthKzgContext {
    /// Load the trusted setup (ckzg4844 text format). Pass None for the
    /// bundled Ethereum mainnet setup.
    pub fn load_trusted_setup(path: Option<&Path>) -> Result<Self, KzgError> {
        let cpath = path
            .map(|p| CString::new(p.to_string_lossy().as_bytes()).unwrap())
            .unwrap_or_else(|| CString::new("").unwrap());
        let ctx = unsafe { sys::ctt_eth_trusted_setup_load(cpath.as_ptr()) };
        if ctx.is_null() {
            return Err(KzgError::SetupLoadFailed);
        }
        Ok(Self { ctx })
    }

    pub fn blob_to_kzg_commitment(
        &self,
        blob: &[u8; BYTES_PER_BLOB],
    ) -> Result<[u8; 48], KzgError> {
        let mut out = sys::ctt_eth_kzg_commitment { raw: [0u8; 48] };
        let b = blob.as_ptr() as *const sys::ctt_eth_kzg_blob;
        status(unsafe {
            sys::ctt_eth_kzg_blob_to_kzg_commitment(self.ctx, &mut out, b)
        })?;
        Ok(out.raw)
    }

    pub fn compute_kzg_proof(
        &self,
        blob: &[u8; BYTES_PER_BLOB],
        z: &[u8; 32],
    ) -> Result<([u8; 48], [u8; 32]), KzgError> {
        let mut proof = sys::ctt_eth_kzg_proof { raw: [0u8; 48] };
        let mut y = sys::ctt_eth_kzg_eval_at_challenge { raw: [0u8; 32] };
        status(unsafe {
            sys::ctt_eth_kzg_compute_kzg_proof(
                self.ctx,
                &mut proof,
                &mut y,
                blob.as_ptr() as *const sys::ctt_eth_kzg_blob,
                z.as_ptr() as *const sys::ctt_eth_kzg_opening_challenge,
            )
        })?;
        Ok((proof.raw, y.raw))
    }

    pub fn verify_kzg_proof(
        &self,
        commitment: &[u8; 48],
        z: &[u8; 32],
        y: &[u8; 32],
        proof: &[u8; 48],
    ) -> Result<bool, KzgError> {
        let s = unsafe {
            sys::ctt_eth_kzg_verify_kzg_proof(
                self.ctx,
                commitment.as_ptr() as *const sys::ctt_eth_kzg_commitment,
                z.as_ptr() as *const sys::ctt_eth_kzg_opening_challenge,
                y.as_ptr() as *const sys::ctt_eth_kzg_eval_at_challenge,
                proof.as_ptr() as *const sys::ctt_eth_kzg_proof,
            )
        };
        match s {
            sys::ctt_eth_kzg_status::cttEthKzg_Success => Ok(true),
            sys::ctt_eth_kzg_status::cttEthKzg_VerificationFailure => Ok(false),
            other => Err(KzgError::InvalidInput(other)),
        }
    }

    pub fn compute_blob_kzg_proof(
        &self,
        blob: &[u8; BYTES_PER_BLOB],
        commitment: &[u8; 48],
    ) -> Result<[u8; 48], KzgError> {
        let mut proof = sys::ctt_eth_kzg_proof { raw: [0u8; 48] };
        status(unsafe {
            sys::ctt_eth_kzg_compute_blob_kzg_proof(
                self.ctx,
                &mut proof,
                blob.as_ptr() as *const sys::ctt_eth_kzg_blob,
                commitment.as_ptr() as *const sys::ctt_eth_kzg_commitment,
            )
        })?;
        Ok(proof.raw)
    }

    pub fn verify_blob_kzg_proof(
        &self,
        blob: &[u8; BYTES_PER_BLOB],
        commitment: &[u8; 48],
        proof: &[u8; 48],
    ) -> Result<bool, KzgError> {
        let s = unsafe {
            sys::ctt_eth_kzg_verify_blob_kzg_proof(
                self.ctx,
                blob.as_ptr() as *const sys::ctt_eth_kzg_blob,
                commitment.as_ptr() as *const sys::ctt_eth_kzg_commitment,
                proof.as_ptr() as *const sys::ctt_eth_kzg_proof,
            )
        };
        match s {
            sys::ctt_eth_kzg_status::cttEthKzg_Success => Ok(true),
            sys::ctt_eth_kzg_status::cttEthKzg_VerificationFailure => Ok(false),
            other => Err(KzgError::InvalidInput(other)),
        }
    }

    pub fn verify_blob_kzg_proof_batch(
        &self,
        blobs: &[[u8; BYTES_PER_BLOB]],
        commitments: &[[u8; 48]],
        proofs: &[[u8; 48]],
        secure_random_bytes: &[u8; 32],
    ) -> Result<bool, KzgError> {
        if blobs.len() != commitments.len() || blobs.len() != proofs.len() {
            return Err(KzgError::InvalidInput(
                sys::ctt_eth_kzg_status::cttEthKzg_InputsLengthsMismatch,
            ));
        }
        let s = unsafe {
            sys::ctt_eth_kzg_verify_blob_kzg_proof_batch(
                self.ctx,
                blobs.as_ptr() as *const sys::ctt_eth_kzg_blob,
                commitments.as_ptr() as *const sys::ctt_eth_kzg_commitment,
                proofs.as_ptr() as *const sys::ctt_eth_kzg_proof,
                blobs.len(),
                secure_random_bytes.as_ptr(),
            )
        };
        match s {
            sys::ctt_eth_kzg_status::cttEthKzg_Success => Ok(true),
            sys::ctt_eth_kzg_status::cttEthKzg_VerificationFailure => Ok(false),
            other => Err(KzgError::InvalidInput(other)),
        }
    }
}
