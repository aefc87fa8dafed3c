//! Ethereum BLS signature verification over the constantine-tpu C ABI —
//! the analogue of constantine-rust/constantine-ethereum-bls-sig.
//!
//! Verification only (signing requires secret keys, which the C protocol
//! surface deliberately does not transport — use the Python API or extend
//! the shim for a trusted signer deployment).

use constantine_tpu_sys::*;

pub struct EthBlsPubKey(pub ctt_eth_bls_pubkey);
pub struct EthBlsSignature(pub ctt_eth_bls_signature);

#[derive(Debug, Clone, Copy, PartialEq, Eq)]
pub enum BlsError {
    VerificationFailure,
    InvalidEncoding,
    PointAtInfinity,
    NotOnCurve,
    NotInSubgroup,
    LengthsMismatch,
    Runtime,
}

fn map_status(s: ctt_eth_bls_status) -> Result<(), BlsError> {
    use ctt_eth_bls_status::*;
    match s {
        cttEthBls_Success => Ok(()),
        cttEthBls_VerificationFailure => Err(BlsError::VerificationFailure),
        cttEthBls_InputsLengthsMismatch => Err(BlsError::LengthsMismatch),
        cttEthBls_PointAtInfinity => Err(BlsError::PointAtInfinity),
        cttEthBls_EccInvalidEncoding => Err(BlsError::InvalidEncoding),
        cttEthBls_EccPointNotOnCurve => Err(BlsError::NotOnCurve),
        cttEthBls_EccPointNotInSubgroup => Err(BlsError::NotInSubgroup),
        cttEthBls_RuntimeError => Err(BlsError::Runtime),
    }
}

impl EthBlsPubKey {
    pub fn from_compressed(raw: [u8; 48]) -> Self {
        Self(ctt_eth_bls_pubkey { raw })
    }
}

impl EthBlsSignature {
    pub fn from_compressed(raw: [u8; 96]) -> Self {
        Self(ctt_eth_bls_signature { raw })
    }
}

/// e(pk, H(m)) == e(G1, sig) — ctt_eth_bls_verify.
pub fn verify(pubkey: &EthBlsPubKey, message: &[u8],
              signature: &EthBlsSignature) -> Result<(), BlsError> {
    map_status(unsafe {
        ctt_eth_bls_verify(&pubkey.0, message.as_ptr(), message.len(),
                           &signature.0)
    })
}

/// Blinded batch verification — ctt_eth_bls_batch_verify.
pub fn batch_verify(pubkeys: &[EthBlsPubKey], messages: &[&[u8]],
                    signatures: &[EthBlsSignature],
                    secure_random_bytes: &[u8; 32]) -> Result<(), BlsError> {
    if pubkeys.len() != messages.len() || messages.len() != signatures.len() {
        return Err(BlsError::LengthsMismatch);
    }
    let pks: Vec<ctt_eth_bls_pubkey> = pubkeys.iter().map(|p| p.0).collect();
    let sigs: Vec<ctt_eth_bls_signature> =
        signatures.iter().map(|s| s.0).collect();
    let ptrs: Vec<*const u8> = messages.iter().map(|m| m.as_ptr()).collect();
    let lens: Vec<usize> = messages.iter().map(|m| m.len()).collect();
    map_status(unsafe {
        ctt_eth_bls_batch_verify(pks.as_ptr(), ptrs.as_ptr(), lens.as_ptr(),
                                 sigs.as_ptr(), pks.len(),
                                 secure_random_bytes.as_ptr())
    })
}
