"""BLS signature spec vectors v0.1.1 (ethereum/bls12-381-tests).

The same JSON suites the reference runs in t_ethereum_bls_signatures.nim
(tests/protocol_blssig_pop_on_bls12381_g2_test_vectors_v0.1.1): sign,
verify, aggregate, fast_aggregate_verify, aggregate_verify, batch_verify,
hash_to_G2 known answers and G1/G2 deserialization acceptance.
"""

import glob
import json
import os

import numpy as np
import pytest

from constantine_tpu.models.bls_signatures import get_bls, DST

REF = os.environ.get("CONSTANTINE_REF", "/root/reference")
VEC = os.path.join(
    REF, "tests", "protocol_blssig_pop_on_bls12381_g2_test_vectors_v0.1.1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(VEC), reason="BLS spec vectors not available")


def load(suite):
    files = sorted(glob.glob(os.path.join(VEC, suite, "*.json")))
    assert files, f"no vectors for {suite}"
    out = []
    for f in files:
        with open(f) as fh:
            out.append((os.path.basename(f), json.load(fh)))
    return out


def hx(s):
    if s is None:
        return None
    return bytes.fromhex(s[2:] if s.startswith("0x") else s)


def test_sign_vectors():
    bls = get_bls()
    for name, case in load("sign"):
        sk = int(case["input"]["privkey"], 16)
        msg = hx(case["input"]["message"])
        expected = hx(case["output"]) if case["output"] else None
        got = bls.sign([sk], [msg])
        if expected is None:
            assert got is None, name
        else:
            assert got == expected, name


def test_verify_vectors():
    bls = get_bls()
    for name, case in load("verify"):
        inp = case["input"]
        got = bls.verify(hx(inp["pubkey"]), [hx(inp["message"])],
                         hx(inp["signature"]))
        assert bool(got[0]) == case["output"], name


def test_aggregate_vectors():
    bls = get_bls()
    for name, case in load("aggregate"):
        sigs = b"".join(hx(s) for s in case["input"])
        expected = hx(case["output"]) if case["output"] else None
        got = bls.aggregate_signatures(sigs)
        if expected is None:
            assert got is None, name
        else:
            assert got == expected, name


def test_fast_aggregate_verify_vectors():
    bls = get_bls()
    for name, case in load("fast_aggregate_verify"):
        inp = case["input"]
        got = bls.fast_aggregate_verify(
            b"".join(hx(p) for p in inp["pubkeys"]),
            hx(inp["message"]), hx(inp["signature"]))
        assert got == case["output"], name


def test_aggregate_verify_vectors():
    bls = get_bls()
    for name, case in load("aggregate_verify"):
        inp = case["input"]
        got = bls.aggregate_verify(
            b"".join(hx(p) for p in inp["pubkeys"]),
            [hx(m) for m in inp["messages"]], hx(inp["signature"]))
        assert got == case["output"], name


def test_batch_verify_vectors():
    bls = get_bls()
    for name, case in load("batch_verify"):
        inp = case["input"]
        got = bls.batch_verify(
            b"".join(hx(p) for p in inp["pubkeys"]),
            [hx(m) for m in inp["messages"]],
            b"".join(hx(s) for s in inp["signatures"]),
            secure_blinding=b"\x2a" * 32)
        assert got == case["output"], name


def test_deserialization_g1_vectors():
    bls = get_bls()
    for name, case in load("deserialization_G1"):
        data = hx(case["input"]["pubkey"])
        if len(data) != 48:
            ok = False
        else:
            _, inf, valid = bls.codec.g1_decompress(data)
            # pubkey deserialization rejects the point at infinity
            ok = bool(np.asarray(valid).all() and not np.asarray(inf).any())
        assert ok == case["output"], name


def test_deserialization_g2_vectors():
    bls = get_bls()
    for name, case in load("deserialization_G2"):
        data = hx(case["input"]["signature"])
        if len(data) != 96:
            ok = False
        else:
            _, inf, valid = bls.codec.g2_decompress(data)
            ok = bool(np.asarray(valid).all() and not np.asarray(inf).any())
        assert ok == case["output"], name


def test_hash_to_g2_vectors():
    import jax
    bls = get_bls()
    fp = bls.ctx.fp
    cases = load("hash_to_G2")
    msgs = [case["input"]["msg"].encode() for _, case in cases]
    H = bls.h2c.hash_to_g2(msgs, DST)
    (x, y), inf = bls.ctx.g2.to_affine(H)
    xc = fp.decode(jax.device_get(x).reshape(-1, fp.L))
    yc = fp.decode(jax.device_get(y).reshape(-1, fp.L))
    for i, (name, case) in enumerate(cases):
        ex = [int(v, 16) for v in case["output"]["x"].split(",")]
        ey = [int(v, 16) for v in case["output"]["y"].split(",")]
        assert [xc[2 * i], xc[2 * i + 1]] == ex, name
        assert [yc[2 * i], yc[2 * i + 1]] == ey, name
