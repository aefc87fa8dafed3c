"""Auxiliary subsystem tests: ChaCha20/Poly1305 (RFC 8439 vectors, same as
the reference's t_cipher_chacha20.nim / mac tests), sysrand, multilinear
extensions (vs naive host sum), the circom r1cs parser, and metering."""

import struct

import numpy as np
import jax.numpy as jnp

from constantine_tpu.utils.ciphers import chacha20, poly1305, sysrand


def test_chacha20_rfc8439():
    # RFC 8439 §2.4.2 test vector
    key = bytes(range(32))
    nonce = bytes.fromhex("000000000000004a00000000")
    plaintext = (b"Ladies and Gentlemen of the class of '99: If I could "
                 b"offer you only one tip for the future, sunscreen would "
                 b"be it.")
    ct = chacha20(key, 1, nonce, plaintext)
    assert ct.hex() == (
        "6e2e359a2568f98041ba0728dd0d6981e97e7aec1d4360c20a27afccfd9fae0b"
        "f91b65c5524733ab8f593dabcd62b3571639d624e65152ab8f530c359f0861d8"
        "07ca0dbf500d6a6156a38e088a22b65e52bc514d16ccf806818ce91ab7793736"
        "5af90bbf74a35be6b40b8eedf2785e42874d")
    # involution
    assert chacha20(key, 1, nonce, ct) == plaintext
    # empty
    assert chacha20(key, 0, nonce, b"") == b""


def test_chacha20_block_vector():
    # RFC 8439 §2.3.2: keystream block itself (counter=1)
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    out = chacha20(key, 1, nonce, b"\x00" * 64)
    assert out[:16].hex() == "10f1e7e4d13b5915500fdd1fa32071c4"


def test_poly1305_rfc8439():
    # RFC 8439 §2.5.2
    key = bytes.fromhex(
        "85d6be7857556d337f4452fe42d506a8"
        "0103808afb0db2fd4abff6af4149f51b")
    msg = b"Cryptographic Forum Research Group"
    tag = poly1305(key, msg)
    assert tag.hex() == "a8061dc1305136c6c22b8baf0c0127a9"


def test_sysrand():
    a, b = sysrand(32), sysrand(32)
    assert len(a) == 32 and a != b


def test_mle_matches_naive():
    from constantine_tpu.named.precompute import get_field
    from constantine_tpu.ops.mle import MLE
    F = get_field("F10007")
    p = F.p_int
    table = [3, 1, 4, 1, 5, 9, 2, 6]          # v = 3
    mle = MLE(F, jnp.asarray(F.encode(table)))
    pts = [(2, 7, 11), (0, 1, 1), (9999, 5, 0)]
    xs = jnp.asarray(F.encode(
        [c for pt in pts for c in pt])).reshape(len(pts), 3, F.L)
    for endian in ("big", "little"):
        got = F.decode(mle.evaluate(xs, endian=endian))
        for gi, pt in zip(got, pts):
            exp = 0
            for w in range(8):
                bits = [(w >> (2 - i)) & 1 if endian == "big"
                        else (w >> i) & 1 for i in range(3)]
                term = table[w]
                for xi, wi in zip(pt, bits):
                    term = term * ((xi if wi else (1 - xi)) % p) % p
                exp = (exp + term) % p
            assert gi == exp, (endian, pt)


def test_r1cs_parser_roundtrip():
    from constantine_tpu.utils.r1cs import parse_r1cs, MAGIC
    # hand-build a tiny r1cs: 1 constraint (2w1)*(3w2) = (6w3), fs=32
    prime = (1 << 255) - 19
    fs = 32

    def lc(terms):
        out = struct.pack("<I", len(terms))
        for widx, coeff in terms:
            out += struct.pack("<I", widx) + coeff.to_bytes(fs, "little")
        return out

    header = (struct.pack("<I", fs) + prime.to_bytes(fs, "little")
              + struct.pack("<IIIIQI", 4, 1, 1, 1, 4, 1))
    cons = lc([(1, 2)]) + lc([(2, 3)]) + lc([(3, 6)])
    w2l = struct.pack("<4Q", 0, 1, 2, 3)
    data = (MAGIC + struct.pack("<II", 1, 3)
            + struct.pack("<IQ", 1, len(header)) + header
            + struct.pack("<IQ", 2, len(cons)) + cons
            + struct.pack("<IQ", 3, len(w2l)) + w2l)
    r = parse_r1cs(data)
    assert r.header.prime == prime
    assert r.header.n_wires == 4
    assert r.header.n_constraints == 1
    assert r.constraints == [([(1, 2)], [(2, 3)], [(3, 6)])]
    assert r.wire_to_label == [0, 1, 2, 3]
    sp = r.to_sparse()
    assert sp["A"] == ([0], [1], [2])
    assert sp["C"] == ([0], [3], [6])


def test_metering_counts():
    from constantine_tpu.named.precompute import get_field
    from constantine_tpu.utils.metering import Meter
    F = get_field("F101")
    a = jnp.asarray(F.encode([5, 6, 7]))  # before wrap: encode calls mul
    m = Meter()
    m.wrap(F, ("mul", "add"), prefix="F101")
    F.mul(a, a)
    F.mul(a, a)
    F.add(a, a)
    assert m.counts["F101.mul"] == 2
    assert m.counts["F101.add"] == 1
    assert m.lanes["F101.mul"] == 6
    assert "F101.mul" in m.report()
    m.unwrap()
    F.mul(a, a)
    assert m.counts["F101.mul"] == 2
