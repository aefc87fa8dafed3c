"""EIP-7594 PeerDAS Fulu consensus vector tests (bit-exactness gate).

Same vectors the reference runs (tests/protocol_ethereum_eip7594_fulu_peerdas
from the reference checkout, t_eth_eip7594_peerdas.nim analogue): success
outputs byte-equal, every rejection branch -> None.
"""

import glob
import os

import pytest
import yaml

from constantine_tpu.models.peerdas import get_peerdas

REF = os.environ.get("CONSTANTINE_REF", "/root/reference")
VEC = os.path.join(REF, "tests", "protocol_ethereum_eip7594_fulu_peerdas")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VEC), reason="Fulu PeerDAS vectors not available")

# Full vector sets by default (committed gate); CTT_VECTORS_FAST=1 caps.
ALL = os.environ.get("CTT_VECTORS_FAST", "0") != "1"


def load_cases(suite):
    files = sorted(glob.glob(os.path.join(VEC, suite, "*", "*", "data.yaml")))
    assert files, f"no vectors for {suite}"
    out = []
    for f in files:
        with open(f) as fh:
            out.append((os.path.basename(os.path.dirname(f)),
                        yaml.safe_load(fh)))
    return out


def hx(s):
    return bytes.fromhex(s[2:]) if s else None


def test_compute_cells_vectors():
    pd = get_peerdas()
    cases = load_cases("compute_cells")
    if not ALL:
        cases = cases[:6]
    for name, case in cases:
        blob = hx(case["input"]["blob"])
        expected = case["output"]
        got = pd.compute_cells(blob)
        if expected is None:
            assert got is None, name
        else:
            assert got == [hx(c) for c in expected], name


def test_compute_cells_and_kzg_proofs_vectors():
    pd = get_peerdas()
    cases = load_cases("compute_cells_and_kzg_proofs")
    if not ALL:
        cases = cases[:4]
    for name, case in cases:
        blob = hx(case["input"]["blob"])
        expected = case["output"]
        got = pd.compute_cells_and_kzg_proofs(blob)
        if expected is None:
            assert got is None, name
        else:
            cells, proofs = got
            assert cells == [hx(c) for c in expected[0]], name
            assert proofs == [hx(p) for p in expected[1]], name


def test_verify_cell_kzg_proof_batch_vectors():
    pd = get_peerdas()
    cases = load_cases("verify_cell_kzg_proof_batch")
    if not ALL:
        cases = cases[:12]
    for name, case in cases:
        inp = case["input"]
        expected = case["output"]
        got = pd.verify_cell_kzg_proof_batch(
            [hx(c) for c in inp["commitments"]],
            list(inp["cell_indices"]),
            [hx(c) for c in inp["cells"]],
            [hx(p) for p in inp["proofs"]])
        if expected is None:
            assert got is None, name
        else:
            assert got == expected, name


def test_recover_cells_and_kzg_proofs_vectors():
    pd = get_peerdas()
    cases = load_cases("recover_cells_and_kzg_proofs")
    if not ALL:
        cases = cases[:4]
    for name, case in cases:
        inp = case["input"]
        expected = case["output"]
        got = pd.recover_cells_and_kzg_proofs(
            list(inp["cell_indices"]), [hx(c) for c in inp["cells"]])
        if expected is None:
            assert got is None, name
        else:
            cells, proofs = got
            assert cells == [hx(c) for c in expected[0]], name
            assert proofs == [hx(p) for p in expected[1]], name


def test_batch_challenge_vectors():
    pd = get_peerdas()
    for name, case in load_cases("compute_verify_cell_kzg_proof_batch_challenge"):
        inp = case["input"]
        cells = [b"".join(hx(e) for e in evs) for evs in inp["cosets_evals"]]
        r = pd._batch_challenge(
            [hx(c) for c in inp["commitments"]],
            list(inp["commitment_indices"]), list(inp["cell_indices"]),
            cells, [hx(p) for p in inp["proofs"]])
        assert r == int.from_bytes(hx(case["output"]), "big") % pd.ctx.r, name
