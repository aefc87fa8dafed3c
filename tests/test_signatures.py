"""BLS signature, ECDSA and EIP-2333 tests.

BLS: sign/verify roundtrip + tamper rejection + aggregate/batch (the
reference's t_ethereum_bls_signatures.nim covers the same protocol paths via
spec vectors; roundtrips + known-answer pubkey derivation gate us here).
ECDSA: RFC 6979 known-answer test (secp256k1, SHA-256) + roundtrips.
EIP-2333: spec test case 0.
"""

import numpy as np
import pytest

from constantine_tpu.models.bls_signatures import get_bls
from constantine_tpu.models.ecdsa import get_ecdsa
from constantine_tpu.models import eip2333


@pytest.fixture(scope="module")
def bls():
    return get_bls()


def test_derive_pubkey_known(bls):
    # sk = 1 -> pubkey == compressed G1 generator
    pk = bls.derive_pubkeys([1])
    assert pk.hex().startswith("97f1d3a73197d794")
    # EIP-2333-ish known secret
    sks = [3 ** 42 % bls.ctx.r, 12345]
    pks = bls.derive_pubkeys(sks)
    assert len(pks) == 96


def test_bls_sign_verify_roundtrip(bls):
    sks = [7, 1234567891011, 3 ** 100 % bls.ctx.r]
    msgs = [b"hello", b"world", b"constantine-tpu"]
    pks = bls.derive_pubkeys(sks)
    sigs = bls.sign(sks, msgs)
    ok = bls.verify(pks, msgs, sigs)
    assert ok.all(), ok
    # tampered message fails only that lane
    bad_msgs = [msgs[0], b"wrong", msgs[2]]
    ok = bls.verify(pks, bad_msgs, sigs)
    assert list(ok) == [True, False, True]
    # swapped signature fails
    swapped = sigs[96:192] + sigs[0:96] + sigs[192:]
    ok = bls.verify(pks, msgs, swapped)
    assert not ok[0] and not ok[1] and ok[2]


def test_bls_aggregate_and_batch(bls):
    sks = [11, 22, 33, 44]
    msg = b"same message"
    pks = bls.derive_pubkeys(sks)
    sigs = bls.sign(sks, [msg] * 4)
    agg = bls.aggregate_signatures(sigs)
    assert bls.fast_aggregate_verify(pks, msg, agg)
    assert not bls.fast_aggregate_verify(pks, b"other", agg)
    # distinct messages -> aggregate_verify
    msgs = [b"m1", b"m2", b"m3", b"m4"]
    sigs = bls.sign(sks, msgs)
    agg = bls.aggregate_signatures(sigs)
    assert bls.aggregate_verify(pks, msgs, agg)
    # batch verify with blinding
    assert bls.batch_verify(pks, msgs, sigs, secure_blinding=b"\x05" * 32)
    bad = sigs[:96] + bls.sign([99], [b"m2"]) + sigs[192:]
    assert not bls.batch_verify(pks, msgs, bad, secure_blinding=b"\x05" * 32)


def test_ecdsa_rfc6979_known():
    """RFC 6979 A.2.5-style known answer for secp256k1/SHA-256
    (the canonical test: key=0x1, msg='sample')? Use the well-known
    secp256k1 vector: d=1, m='Satoshi Nakamoto'."""
    e = get_ecdsa("Secp256k1")
    sigs = e.sign([1], [b"Satoshi Nakamoto"])
    r, s = sigs[0]
    assert r == 0x934B1EA10A4B3C1757E2B0C017D0B6143CE3C9A7E6A4A49860D7A6AB210EE3D8
    assert s == 0x2442CE9D2B916064108014783E923EC36B49743E2FFA1C4496F01A512AAFD9E5


def test_ecdsa_sign_verify():
    for curve in ("Secp256k1", "P256"):
        e = get_ecdsa(curve)
        from constantine_tpu.utils import refmath as rm
        sks = [5, 987654321, 2**200 + 3]
        msgs = [b"alpha", b"beta", b"gamma"]
        pubs = [rm.ec_mul(d, e.ctx.g, e.ctx.params.a, e.ctx.p) for d in sks]
        sigs = e.sign(sks, msgs)
        assert e.verify(pubs, msgs, sigs).all(), curve
        bad = [(r, (s + 1) % e.n) for (r, s) in sigs]
        assert not e.verify(pubs, msgs, bad).any(), curve
        # DER roundtrip
        der = e.sig_to_der(*sigs[0])
        assert e.sig_from_der(der) == sigs[0]


def test_eip2333_vectors():
    seed = bytes.fromhex(
        "c55257c360c07c72029aebc1b53c05ed0362ada38ead3e3e9efa3708e5349553"
        "1f09a6987599d18264c1e1c92f2cf141630c7a3c4ab7c81b2f001698e7463b04")
    m = eip2333.derive_master_sk(seed)
    assert m == 6083874454709270928345386274498605044986640685124978867557563392430687146096
    c = eip2333.derive_child_sk(m, 0)
    assert c == 20397789859736650942317412262472558107875392172444076792671091975210932703118
