"""EVM precompile vector tests (reference
tests/protocol_ethereum_evm_precompiles/*.json, t_ethereum_evm_precompiles.nim
analogue). Success cases assert byte equality; fail-* vectors assert
rejection (None)."""

import json
import os

import pytest

from constantine_tpu.models import evm_precompiles as evm

REF = os.environ.get("CONSTANTINE_REF", "/root/reference")
VEC = os.path.join(REF, "tests", "protocol_ethereum_evm_precompiles")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VEC), reason="EVM vectors not available")


def load(name):
    with open(os.path.join(VEC, name)) as f:
        return json.load(f)


def run_cases(fn, name, limit=None, expect_fail=False):
    cases = load(name)
    if limit:
        cases = cases[:limit]
    for case in cases:
        inp = bytes.fromhex(case["Input"])
        got = fn(inp)
        if expect_fail:
            assert got is None, f"{name}:{case.get('Name')}"
        else:
            exp = bytes.fromhex(case.get("Expected", ""))
            assert got == exp, f"{name}:{case.get('Name')}"


def test_modexp():
    run_cases(evm.eth_evm_modexp, "modexp.json")
    run_cases(evm.eth_evm_modexp, "modexp_eip2565.json")


def test_bn254_add():
    run_cases(evm.eth_evm_bn254_g1add, "bn256Add.json")


def test_bn254_mul():
    run_cases(evm.eth_evm_bn254_g1mul, "bn256ScalarMul.json")


def test_bn254_pairing():
    run_cases(evm.eth_evm_bn254_ecpairingcheck, "bn256Pairing.json", limit=6)


def test_bls_g1add():
    run_cases(evm.eth_evm_bls12381_g1add, "eip-2537/add_G1_bls.json")
    run_cases(evm.eth_evm_bls12381_g1add, "eip-2537/fail-add_G1_bls.json",
              expect_fail=True)


def test_bls_g2add():
    run_cases(evm.eth_evm_bls12381_g2add, "eip-2537/add_G2_bls.json")
    run_cases(evm.eth_evm_bls12381_g2add, "eip-2537/fail-add_G2_bls.json",
              expect_fail=True)


def test_bls_g1msm():
    run_cases(evm.eth_evm_bls12381_g1msm, "eip-2537/multiexp_G1_bls.json",
              limit=6)
    run_cases(evm.eth_evm_bls12381_g1msm,
              "eip-2537/fail-multiexp_G1_bls.json", expect_fail=True)


def test_bls_g2msm():
    run_cases(evm.eth_evm_bls12381_g2msm, "eip-2537/multiexp_G2_bls.json",
              limit=4)


def test_bls_map_fp_to_g1():
    run_cases(evm.eth_evm_bls12381_map_fp_to_g1,
              "eip-2537/map_fp_to_G1_bls.json", limit=6)
    run_cases(evm.eth_evm_bls12381_map_fp_to_g1,
              "eip-2537/fail-map_fp_to_G1_bls.json", expect_fail=True)


def test_bls_map_fp2_to_g2():
    run_cases(evm.eth_evm_bls12381_map_fp2_to_g2,
              "eip-2537/map_fp2_to_G2_bls.json", limit=4)


def test_bls_pairing():
    run_cases(evm.eth_evm_bls12381_pairingcheck,
              "eip-2537/pairing_check_bls.json", limit=4)


def test_sha256_ripemd():
    import hashlib
    data = b"evm precompile test"
    assert evm.eth_evm_sha256(data) == hashlib.sha256(data).digest()
    assert evm.eth_evm_ripemd160(b"abc")[12:].hex() == \
        "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc"
