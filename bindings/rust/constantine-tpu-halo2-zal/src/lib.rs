//! halo2 ZAL (ZK Acceleration Layer) engine over the constantine-tpu
//! device MSM — the analogue of constantine-rust/constantine-halo2-zal
//! (MsmAccel trait impl for halo2curves' bls12381::G1).
//!
//! The halo2curves/ff/group crates are not vendored in this image, so the
//! engine exposes the same call SHAPES against raw byte encodings; gluing
//! it to `MsmAccel<bls12381::G1Affine>` is a ~30-line adapter converting
//! `C::Curve` points to 96-byte uncompressed big-endian form (the format
//! ctt_bls12381_g1_msm consumes).

use constantine_tpu_sys::ctt_bls12381_g1_msm;

/// Engine handle — mirrors CttEngine/CttMsmCoeffsDesc/CttMsmBaseDesc of
/// the reference's halo2-zal: descriptors are just the byte slices here
/// (the TPU runtime caches device-resident bases internally).
pub struct CttEngine;

pub struct CoeffsDescriptor<'c> {
    raw: &'c [u8],
}
pub struct BaseDescriptor<'b> {
    raw: &'b [u8],
}

#[derive(Debug, Clone, Copy, PartialEq, Eq)]
pub struct MsmError;

impl CttEngine {
    pub fn new(_num_threads: usize) -> Self {
        // thread count is meaningless on the TPU runtime; kept for call
        // parity with CttEngine::new(&ctt, n)
        CttEngine
    }

    /// msm(coeffs, bases): coeffs n x 32B BE scalars; bases n x 96B BE
    /// uncompressed points. Returns the 96B uncompressed sum.
    pub fn msm(&self, coeffs: &[u8], bases: &[u8]) -> Result<[u8; 96], MsmError> {
        if bases.len() % 96 != 0 || coeffs.len() % 32 != 0 {
            return Err(MsmError);
        }
        let n = bases.len() / 96;
        if n == 0 || coeffs.len() / 32 != n {
            return Err(MsmError);
        }
        let mut out = [0u8; 96];
        let rc = unsafe {
            ctt_bls12381_g1_msm(out.as_mut_ptr(), bases.as_ptr(),
                                coeffs.as_ptr(), n)
        };
        if rc == 0 { Ok(out) } else { Err(MsmError) }
    }

    /// MsmAccel::get_coeffs_descriptor analogue.
    pub fn get_coeffs_descriptor<'c>(&self, coeffs: &'c [u8])
        -> CoeffsDescriptor<'c> {
        CoeffsDescriptor { raw: coeffs }
    }

    /// MsmAccel::get_base_descriptor analogue.
    pub fn get_base_descriptor<'b>(&self, base: &'b [u8])
        -> BaseDescriptor<'b> {
        BaseDescriptor { raw: base }
    }

    pub fn msm_with_cached_scalars(&self, coeffs: &CoeffsDescriptor<'_>,
                                   base: &[u8]) -> Result<[u8; 96], MsmError> {
        self.msm(coeffs.raw, base)
    }

    pub fn msm_with_cached_base(&self, coeffs: &[u8],
                                base: &BaseDescriptor<'_>)
        -> Result<[u8; 96], MsmError> {
        self.msm(coeffs, base.raw)
    }

    pub fn msm_with_cached_inputs(&self, coeffs: &CoeffsDescriptor<'_>,
                                  base: &BaseDescriptor<'_>)
        -> Result<[u8; 96], MsmError> {
        self.msm(coeffs.raw, base.raw)
    }
}
