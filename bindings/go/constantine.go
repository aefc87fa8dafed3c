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

// ---------------------------------------------------------------------
// EVM precompiles — full EIP-196/197/2537 surface
// (constantine-go/constantine.go EVM section parity)
// ---------------------------------------------------------------------

func evmCall(fn func(*C.uchar, *C.uchar, C.size_t) C.int, outLen int,
	input []byte) ([]byte, error) {
	out := make([]byte, outLen)
	var in *C.uchar
	if len(input) > 0 {
		in = (*C.uchar)(unsafe.Pointer(&input[0]))
	}
	if fn((*C.uchar)(unsafe.Pointer(&out[0])), in, C.size_t(len(input))) != 0 {
		return nil, ErrInvalidInput
	}
	return out, nil
}

func EVMSha256(input []byte) ([]byte, error) {
	return evmCall(func(o, i *C.uchar, l C.size_t) C.int {
		return C.ctt_eth_evm_sha256(o, i, l)
	}, 32, input)
}

func EVMRipemd160(input []byte) ([]byte, error) {
	return evmCall(func(o, i *C.uchar, l C.size_t) C.int {
		return C.ctt_eth_evm_ripemd160(o, i, l)
	}, 32, input)
}

func EVMBn254G1Add(input []byte) ([]byte, error) {
	return evmCall(func(o, i *C.uchar, l C.size_t) C.int {
		return C.ctt_eth_evm_bn254_g1add(o, i, l)
	}, 64, input)
}

func EVMBn254G1Mul(input []byte) ([]byte, error) {
	return evmCall(func(o, i *C.uchar, l C.size_t) C.int {
		return C.ctt_eth_evm_bn254_g1mul(o, i, l)
	}, 64, input)
}

func EVMBn254EcPairingCheck(input []byte) ([]byte, error) {
	return evmCall(func(o, i *C.uchar, l C.size_t) C.int {
		return C.ctt_eth_evm_bn254_ecpairingcheck(o, i, l)
	}, 32, input)
}

func EVMBls12381G1Add(input []byte) ([]byte, error) {
	return evmCall(func(o, i *C.uchar, l C.size_t) C.int {
		return C.ctt_eth_evm_bls12381_g1add(o, i, l)
	}, 128, input)
}

func EVMBls12381G1Msm(input []byte) ([]byte, error) {
	return evmCall(func(o, i *C.uchar, l C.size_t) C.int {
		return C.ctt_eth_evm_bls12381_g1msm(o, i, l)
	}, 128, input)
}

func EVMBls12381G2Add(input []byte) ([]byte, error) {
	return evmCall(func(o, i *C.uchar, l C.size_t) C.int {
		return C.ctt_eth_evm_bls12381_g2add(o, i, l)
	}, 256, input)
}

func EVMBls12381G2Msm(input []byte) ([]byte, error) {
	return evmCall(func(o, i *C.uchar, l C.size_t) C.int {
		return C.ctt_eth_evm_bls12381_g2msm(o, i, l)
	}, 256, input)
}

func EVMBls12381PairingCheck(input []byte) ([]byte, error) {
	return evmCall(func(o, i *C.uchar, l C.size_t) C.int {
		return C.ctt_eth_evm_bls12381_pairingcheck(o, i, l)
	}, 32, input)
}

func EVMBls12381MapFpToG1(input []byte) ([]byte, error) {
	return evmCall(func(o, i *C.uchar, l C.size_t) C.int {
		return C.ctt_eth_evm_bls12381_map_fp_to_g1(o, i, l)
	}, 128, input)
}

func EVMBls12381MapFp2ToG2(input []byte) ([]byte, error) {
	return evmCall(func(o, i *C.uchar, l C.size_t) C.int {
		return C.ctt_eth_evm_bls12381_map_fp2_to_g2(o, i, l)
	}, 256, input)
}

// ---------------------------------------------------------------------
// EIP-7594 PeerDAS (constantine-go PeerDAS section parity)
// ---------------------------------------------------------------------

const (
	BytesPerCell     = 2048
	CellsPerExtBlob  = 128
)

// ComputeCellsAndKZGProofs: blob -> 128 cells + 128 proofs.
func (ctx *EthKzgContext) ComputeCellsAndKZGProofs(blob []byte) ([][]byte, [][]byte, error) {
	if len(blob) != BytesPerBlob {
		return nil, nil, ErrInvalidInput
	}
	cells := make([]byte, CellsPerExtBlob*BytesPerCell)
	proofs := make([]byte, CellsPerExtBlob*48)
	st := C.ctt_eth_peerdas_compute_cells_and_kzg_proofs(
		ctx.ctx,
		(*C.ctt_eth_kzg_cell)(unsafe.Pointer(&cells[0])),
		(*C.ctt_eth_kzg_proof)(unsafe.Pointer(&proofs[0])),
		(*C.ctt_eth_kzg_blob)(unsafe.Pointer(&blob[0])))
	if err := kzgStatus(st); err != nil {
		return nil, nil, err
	}
	return splitN(cells, BytesPerCell), splitN(proofs, 48), nil
}

// RecoverCellsAndKZGProofs: >= 64 known (index, cell) pairs -> all 128.
func (ctx *EthKzgContext) RecoverCellsAndKZGProofs(cellIndices []uint64, cells [][]byte) ([][]byte, [][]byte, error) {
	n := len(cellIndices)
	if n == 0 || len(cells) != n {
		return nil, nil, ErrInvalidInput
	}
	flat := make([]byte, 0, n*BytesPerCell)
	for _, c := range cells {
		if len(c) != BytesPerCell {
			return nil, nil, ErrInvalidInput
		}
		flat = append(flat, c...)
	}
	cellsOut := make([]byte, CellsPerExtBlob*BytesPerCell)
	proofsOut := make([]byte, CellsPerExtBlob*48)
	st := C.ctt_eth_peerdas_recover_cells_and_kzg_proofs(
		ctx.ctx,
		(*C.ctt_eth_kzg_cell)(unsafe.Pointer(&cellsOut[0])),
		(*C.ctt_eth_kzg_proof)(unsafe.Pointer(&proofsOut[0])),
		(*C.uint64_t)(unsafe.Pointer(&cellIndices[0])),
		(*C.ctt_eth_kzg_cell)(unsafe.Pointer(&flat[0])),
		C.size_t(n))
	if err := kzgStatus(st); err != nil {
		return nil, nil, err
	}
	return splitN(cellsOut, BytesPerCell), splitN(proofsOut, 48), nil
}

// VerifyCellKZGProofBatch: universal verification equation over n cells.
func (ctx *EthKzgContext) VerifyCellKZGProofBatch(commitments [][]byte, cellIndices []uint64, cells [][]byte, proofs [][]byte) (bool, error) {
	n := len(cellIndices)
	if n == 0 || len(commitments) != n || len(cells) != n || len(proofs) != n {
		return false, ErrInvalidInput
	}
	fc := make([]byte, 0, n*48)
	fcl := make([]byte, 0, n*BytesPerCell)
	fp := make([]byte, 0, n*48)
	for i := 0; i < n; i++ {
		if len(commitments[i]) != 48 || len(cells[i]) != BytesPerCell || len(proofs[i]) != 48 {
			return false, ErrInvalidInput
		}
		fc = append(fc, commitments[i]...)
		fcl = append(fcl, cells[i]...)
		fp = append(fp, proofs[i]...)
	}
	st := C.ctt_eth_peerdas_verify_cell_kzg_proof_batch(
		ctx.ctx,
		(*C.ctt_eth_kzg_commitment)(unsafe.Pointer(&fc[0])),
		(*C.uint64_t)(unsafe.Pointer(&cellIndices[0])),
		(*C.ctt_eth_kzg_cell)(unsafe.Pointer(&fcl[0])),
		(*C.ctt_eth_kzg_proof)(unsafe.Pointer(&fp[0])),
		C.size_t(n))
	if st == C.cttEthKzg_Success {
		return true, nil
	}
	if st == C.cttEthKzg_VerificationFailure {
		return false, nil
	}
	return false, ErrInvalidInput
}

func splitN(b []byte, sz int) [][]byte {
	out := make([][]byte, 0, len(b)/sz)
	for i := 0; i+sz <= len(b); i += sz {
		out = append(out, b[i:i+sz])
	}
	return out
}
