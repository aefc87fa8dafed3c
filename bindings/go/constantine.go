// Package constantine provides Go bindings to the constantine_tpu
// protocol C ABI — the counterpart of the reference's cgo wrapper
// (constantine-go/constantine.go): Ethereum EIP-4844 KZG, BLS signature
// verification, hash-to-curve, and EVM MODEXP.
//
// Build: the shim library must be on the linker/runtime path and the
// embedded interpreter needs PYTHONPATH (see
// native/include/constantine_tpu_protocols.h).
package constantine

/*
#cgo CFLAGS: -I${SRCDIR}/../../native/include
#cgo LDFLAGS: -L${SRCDIR}/../../native -lconstantine_tpu_protocols -lpython3.12
#include <stdlib.h>
#include "constantine_tpu_protocols.h"
*/
import "C"

import (
	"errors"
	"unsafe"
)

const BytesPerBlob = 4096 * 32

type EthKzgContext struct {
	ctx *C.ctt_eth_kzg_context
}

var (
	ErrVerificationFailure = errors.New("constantine: verification failure")
	ErrInvalidInput        = errors.New("constantine: invalid input")
	ErrSetupLoad           = errors.New("constantine: trusted setup load failed")
)

func kzgStatus(s C.ctt_eth_kzg_status) error {
	switch s {
	case C.cttEthKzg_Success:
		return nil
	case C.cttEthKzg_VerificationFailure:
		return ErrVerificationFailure
	default:
		return ErrInvalidInput
	}
}

// EthKzgContextNew loads the trusted setup; empty path = bundled mainnet.
func EthKzgContextNew(trustedSetupPath string) (*EthKzgContext, error) {
	cpath := C.CString(trustedSetupPath)
	defer C.free(unsafe.Pointer(cpath))
	ctx := C.ctt_eth_trusted_setup_load(cpath)
	if ctx == nil {
		return nil, ErrSetupLoad
	}
	return &EthKzgContext{ctx: ctx}, nil
}

func (c *EthKzgContext) Delete() {
	C.ctt_eth_trusted_setup_delete(c.ctx)
	c.ctx = nil
}

func (c *EthKzgContext) BlobToKZGCommitment(blob [BytesPerBlob]byte) ([48]byte, error) {
	var out C.ctt_eth_kzg_commitment
	s := C.ctt_eth_kzg_blob_to_kzg_commitment(c.ctx, &out,
		(*C.ctt_eth_kzg_blob)(unsafe.Pointer(&blob[0])))
	var res [48]byte
	if err := kzgStatus(s); err != nil {
		return res, err
	}
	copy(res[:], C.GoBytes(unsafe.Pointer(&out.raw[0]), 48))
	return res, nil
}

func (c *EthKzgContext) ComputeKZGProof(blob [BytesPerBlob]byte, z [32]byte) ([48]byte, [32]byte, error) {
	var proof C.ctt_eth_kzg_proof
	var y C.ctt_eth_kzg_eval_at_challenge
	s := C.ctt_eth_kzg_compute_kzg_proof(c.ctx, &proof, &y,
		(*C.ctt_eth_kzg_blob)(unsafe.Pointer(&blob[0])),
		(*C.ctt_eth_kzg_opening_challenge)(unsafe.Pointer(&z[0])))
	var p [48]byte
	var yv [32]byte
	if err := kzgStatus(s); err != nil {
		return p, yv, err
	}
	copy(p[:], C.GoBytes(unsafe.Pointer(&proof.raw[0]), 48))
	copy(yv[:], C.GoBytes(unsafe.Pointer(&y.raw[0]), 32))
	return p, yv, nil
}

func (c *EthKzgContext) VerifyKZGProof(commitment [48]byte, z, y [32]byte, proof [48]byte) (bool, error) {
	s := C.ctt_eth_kzg_verify_kzg_proof(c.ctx,
		(*C.ctt_eth_kzg_commitment)(unsafe.Pointer(&commitment[0])),
		(*C.ctt_eth_kzg_opening_challenge)(unsafe.Pointer(&z[0])),
		(*C.ctt_eth_kzg_eval_at_challenge)(unsafe.Pointer(&y[0])),
		(*C.ctt_eth_kzg_proof)(unsafe.Pointer(&proof[0])))
	if s == C.cttEthKzg_Success {
		return true, nil
	}
	if s == C.cttEthKzg_VerificationFailure {
		return false, nil
	}
	return false, ErrInvalidInput
}

func (c *EthKzgContext) ComputeBlobKZGProof(blob [BytesPerBlob]byte, commitment [48]byte) ([48]byte, error) {
	var proof C.ctt_eth_kzg_proof
	s := C.ctt_eth_kzg_compute_blob_kzg_proof(c.ctx, &proof,
		(*C.ctt_eth_kzg_blob)(unsafe.Pointer(&blob[0])),
		(*C.ctt_eth_kzg_commitment)(unsafe.Pointer(&commitment[0])))
	var p [48]byte
	if err := kzgStatus(s); err != nil {
		return p, err
	}
	copy(p[:], C.GoBytes(unsafe.Pointer(&proof.raw[0]), 48))
	return p, nil
}

func (c *EthKzgContext) VerifyBlobKZGProof(blob [BytesPerBlob]byte, commitment, proof [48]byte) (bool, error) {
	s := C.ctt_eth_kzg_verify_blob_kzg_proof(c.ctx,
		(*C.ctt_eth_kzg_blob)(unsafe.Pointer(&blob[0])),
		(*C.ctt_eth_kzg_commitment)(unsafe.Pointer(&commitment[0])),
		(*C.ctt_eth_kzg_proof)(unsafe.Pointer(&proof[0])))
	if s == C.cttEthKzg_Success {
		return true, nil
	}
	if s == C.cttEthKzg_VerificationFailure {
		return false, nil
	}
	return false, ErrInvalidInput
}

func (c *EthKzgContext) VerifyBlobKZGProofBatch(blobs [][BytesPerBlob]byte, commitments, proofs [][48]byte, secureRandomBytes [32]byte) (bool, error) {
	if len(blobs) != len(commitments) || len(blobs) != len(proofs) {
		return false, ErrInvalidInput
	}
	if len(blobs) == 0 {
		return true, nil
	}
	s := C.ctt_eth_kzg_verify_blob_kzg_proof_batch(c.ctx,
		(*C.ctt_eth_kzg_blob)(unsafe.Pointer(&blobs[0][0])),
		(*C.ctt_eth_kzg_commitment)(unsafe.Pointer(&commitments[0][0])),
		(*C.ctt_eth_kzg_proof)(unsafe.Pointer(&proofs[0][0])),
		C.size_t(len(blobs)),
		(*C.uchar)(unsafe.Pointer(&secureRandomBytes[0])))
	if s == C.cttEthKzg_Success {
		return true, nil
	}
	if s == C.cttEthKzg_VerificationFailure {
		return false, nil
	}
	return false, ErrInvalidInput
}

// BLSVerify checks one (pubkey, message, signature) triple
// (Ethereum BLS12-381 G2 signatures, RFC 9380 hashing).
func BLSVerify(pubkey [48]byte, message []byte, signature [96]byte) (bool, error) {
	var msgPtr *C.uchar
	if len(message) > 0 {
		msgPtr = (*C.uchar)(unsafe.Pointer(&message[0]))
	}
	s := C.ctt_eth_bls_verify(
		(*C.ctt_eth_bls_pubkey)(unsafe.Pointer(&pubkey[0])),
		msgPtr, C.size_t(len(message)),
		(*C.ctt_eth_bls_signature)(unsafe.Pointer(&signature[0])))
	if s == C.cttEthBls_Success {
		return true, nil
	}
	if s == C.cttEthBls_VerificationFailure {
		return false, nil
	}
	return false, ErrInvalidInput
}

// EVMModexp runs the MODEXP precompile (EIP-198 calldata).
func EVMModexp(out []byte, calldata []byte) error {
	var cd *C.uchar
	if len(calldata) > 0 {
		cd = (*C.uchar)(unsafe.Pointer(&calldata[0]))
	}
	var op *C.uchar
	if len(out) > 0 {
		op = (*C.uchar)(unsafe.Pointer(&out[0]))
	}
	if C.ctt_eth_evm_modexp(op, C.size_t(len(out)), cd, C.size_t(len(calldata))) != 0 {
		return ErrInvalidInput
	}
	return nil
}
