"""EIP-4844 Deneb consensus vector tests (bit-exactness gate).

Runs the same YAML vectors the reference uses
(tests/protocol_ethereum_eip4844_deneb_kzg/** from the reference checkout,
originally from ethereum/consensus-spec-tests). Each suite asserts both the
success outputs (byte equality) and every rejection branch (None expected).

Vector location: $CONSTANTINE_REF/tests/protocol_ethereum_eip4844_deneb_kzg
(defaults to /root/reference). Suites are skipped if the vectors are absent.
"""

import glob
import os

import pytest
import yaml

from constantine_tpu.models import eip4844

REF = os.environ.get("CONSTANTINE_REF", "/root/reference")
VEC = os.path.join(REF, "tests", "protocol_ethereum_eip4844_deneb_kzg")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VEC), reason="Deneb vectors not available")

# The FULL consensus vector sets are the committed gate (VERDICT r3 #3:
# alphabetical truncation biased which rejection branches ran). Set
# CTT_VECTORS_FAST=1 for a capped subset during iteration.
ALL = os.environ.get("CTT_VECTORS_FAST", "0") != "1"


def load_cases(suite):
    files = sorted(glob.glob(os.path.join(VEC, suite, "*", "*", "data.yaml")))
    assert files, f"no vectors for {suite}"
    cases = []
    for f in files:
        with open(f) as fh:
            cases.append((os.path.basename(os.path.dirname(f)),
                          yaml.safe_load(fh)))
    return cases


def hx(s):
    return bytes.fromhex(s[2:]) if s else None


def test_blob_to_kzg_commitment_vectors():
    cases = load_cases("blob_to_kzg_commitment")
    if not ALL:
        cases = cases[:12]
    for name, case in cases:
        blob = hx(case["input"]["blob"])
        expected = case["output"]
        got = eip4844.blob_to_kzg_commitment(blob)
        if expected is None:
            assert got is None, name
        else:
            assert got == hx(expected), name


def test_compute_kzg_proof_vectors():
    cases = load_cases("compute_kzg_proof")
    if not ALL:
        cases = cases[:10]
    for name, case in cases:
        blob = hx(case["input"]["blob"])
        z = hx(case["input"]["z"])
        expected = case["output"]
        got = eip4844.compute_kzg_proof(blob, z)
        if expected is None:
            assert got is None, name
        else:
            assert got is not None, name
            proof, y = got
            assert proof == hx(expected[0]), name
            assert y == hx(expected[1]), name


def test_compute_blob_kzg_proof_vectors():
    cases = load_cases("compute_blob_kzg_proof")
    if not ALL:
        cases = cases[:8]
    for name, case in cases:
        blob = hx(case["input"]["blob"])
        commitment = hx(case["input"]["commitment"])
        expected = case["output"]
        got = eip4844.compute_blob_kzg_proof(blob, commitment)
        if expected is None:
            assert got is None, name
        else:
            assert got == hx(expected), name


def test_verify_kzg_proof_vectors():
    cases = load_cases("verify_kzg_proof")
    if not ALL:
        cases = cases[:12]
    for name, case in cases:
        inp = case["input"]
        expected = case["output"]
        got = eip4844.verify_kzg_proof(hx(inp["commitment"]), hx(inp["z"]),
                                       hx(inp["y"]), hx(inp["proof"]))
        assert got == expected, name


def test_verify_blob_kzg_proof_vectors():
    cases = load_cases("verify_blob_kzg_proof")
    if not ALL:
        cases = cases[:6]
    for name, case in cases:
        inp = case["input"]
        expected = case["output"]
        got = eip4844.verify_blob_kzg_proof(
            hx(inp["blob"]), hx(inp["commitment"]), hx(inp["proof"]))
        assert got == expected, name


def test_verify_blob_kzg_proof_batch_vectors():
    cases = load_cases("verify_blob_kzg_proof_batch")
    if not ALL:
        cases = cases[:4]
    for name, case in cases:
        inp = case["input"]
        expected = case["output"]
        got = eip4844.verify_blob_kzg_proof_batch(
            [hx(b) for b in inp["blobs"]],
            [hx(c) for c in inp["commitments"]],
            [hx(p) for p in inp["proofs"]])
        assert got == expected, name


def test_commit_batch_matches_single():
    """Batched commit == per-blob commits (parallel-variant parity)."""
    import numpy as np
    from constantine_tpu.models.eip4844 import (
        blob_to_kzg_commitment, blob_to_kzg_commitment_batch)
    rng = np.random.default_rng(5)
    blobs = [b"".join(int(v).to_bytes(32, "big")
                      for v in rng.integers(0, 2**62, size=4096))
             for _ in range(3)]
    singles = [blob_to_kzg_commitment(b) for b in blobs]
    batch = blob_to_kzg_commitment_batch(blobs)
    assert batch == singles
    assert blob_to_kzg_commitment_batch([]) == []
    assert blob_to_kzg_commitment_batch([blobs[0], b"xx"]) is None
