//! EVM precompiles over the constantine-tpu C ABI — the analogue of
//! constantine-rust/constantine-ethereum-evm-precompiles. Each call is
//! byte-in/byte-out with the EIP-mandated fixed output size.

use constantine_tpu_sys::*;

#[derive(Debug, Clone, Copy, PartialEq, Eq)]
pub struct EvmError;

macro_rules! precompile {
    ($name:ident, $sym:ident, $outlen:literal) => {
        pub fn $name(input: &[u8]) -> Result<[u8; $outlen], EvmError> {
            let mut out = [0u8; $outlen];
            let rc = unsafe {
                $sym(out.as_mut_ptr(), input.as_ptr(), input.len())
            };
            if rc == 0 { Ok(out) } else { Err(EvmError) }
        }
    };
}

precompile!(eth_evm_sha256, ctt_eth_evm_sha256, 32);
precompile!(eth_evm_ripemd160, ctt_eth_evm_ripemd160, 32);
precompile!(eth_evm_bn254_g1add, ctt_eth_evm_bn254_g1add, 64);
precompile!(eth_evm_bn254_g1mul, ctt_eth_evm_bn254_g1mul, 64);
precompile!(eth_evm_bn254_ecpairingcheck, ctt_eth_evm_bn254_ecpairingcheck, 32);
precompile!(eth_evm_bls12381_g1add, ctt_eth_evm_bls12381_g1add, 128);
precompile!(eth_evm_bls12381_g1msm, ctt_eth_evm_bls12381_g1msm, 128);
precompile!(eth_evm_bls12381_g2add, ctt_eth_evm_bls12381_g2add, 256);
precompile!(eth_evm_bls12381_g2msm, ctt_eth_evm_bls12381_g2msm, 256);
precompile!(eth_evm_bls12381_pairingcheck, ctt_eth_evm_bls12381_pairingcheck, 32);
precompile!(eth_evm_bls12381_map_fp_to_g1, ctt_eth_evm_bls12381_map_fp_to_g1, 128);
precompile!(eth_evm_bls12381_map_fp2_to_g2, ctt_eth_evm_bls12381_map_fp2_to_g2, 256);

/// EIP-198 MODEXP: caller sizes `out` to the modulus length.
pub fn eth_evm_modexp(out: &mut [u8], calldata: &[u8]) -> Result<(), EvmError> {
    let rc = unsafe {
        ctt_eth_evm_modexp(out.as_mut_ptr(), out.len(),
                           calldata.as_ptr(), calldata.len())
    };
    if rc == 0 { Ok(()) } else { Err(EvmError) }
}
