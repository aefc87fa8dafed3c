"""Ethereum Verkle (Banderwagon + IPA) tests.

Vectors are the same cross-implementation known answers the reference
asserts (tests/t_ethereum_verkle_primitives.nim serialization/map-to-field
vectors, tests/t_ethereum_verkle_ipa_primitives.nim transcript/IPA/
multiproof vectors — originally from crate-crypto/go-ipa and
jsign/verkle-test-vectors).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_edwards
from constantine_tpu.utils.codecs_banderwagon import get_banderwagon_codec
from constantine_tpu.models.verkle_ipa import (
    Transcript, get_verkle_ipa, DOMAIN)

# serialize(2^i * G) for i in 0..15 (t_ethereum_verkle_primitives.nim:32-48)
EXPECTED_BIT_STRINGS = [
    "4a2c7486fd924882bf02c6908de395122843e3e05264d7991e18e7985dad51e9",
    "43aa74ef706605705989e8fd38df46873b7eae5921fbed115ac9d937399ce4d5",
    "5e5f550494159f38aa54d2ed7f11a7e93e4968617990445cc93ac8e59808c126",
    "0e7e3748db7c5c999a7bcd93d71d671f1f40090423792266f94cb27ca43fce5c",
    "14ddaa48820cb6523b9ae5fe9fe257cbbd1f3d598a28e670a40da5d1159d864a",
    "6989d1c82b2d05c74b62fb0fbdf8843adae62ff720d370e209a7b84e14548a7d",
    "26b8df6fa414bf348a3dc780ea53b70303ce49f3369212dec6fbe4b349b832bf",
    "37e46072db18f038f2cc7d3d5b5d1374c0eb86ca46f869d6a95fc2fb092c0d35",
    "2c1ce64f26e1c772282a6633fac7ca73067ae820637ce348bb2c8477d228dc7d",
    "297ab0f5a8336a7a4e2657ad7a33a66e360fb6e50812d4be3326fab73d6cee07",
    "5b285811efa7a965bd6ef5632151ebf399115fcc8f5b9b8083415ce533cc39ce",
    "1f939fa2fd457b3effb82b25d3fe8ab965f54015f108f8c09d67e696294ab626",
    "3088dcb4d3f4bacd706487648b239e0be3072ed2059d981fe04ce6525af6f1b8",
    "35fbc386a16d0227ff8673bc3760ad6b11009f749bb82d4facaea67f58fc60ed",
    "00f29b4f3255e318438f0a31e058e4c081085426adb0479f14c64985d0b956e0",
    "3fa4384b2fa0ecc3c0582223602921daaa893a97b64bdf94dcaa504e8b7b9e5f",
]


@pytest.fixture(scope="module")
def ctx():
    return get_edwards("Banderwagon")


@pytest.fixture(scope="module")
def codec():
    return get_banderwagon_codec()


@pytest.fixture(scope="module")
def ipa():
    return get_verkle_ipa()


def test_serialize_doubling_chain(ctx, codec):
    G = ctx.group
    P = G.from_affine(tuple(t for t in ctx.gen))
    xs, ys, neus = [], [], []
    for _ in range(16):
        (x, y), neu = G.to_affine(P)
        xs.append(np.asarray(x)[0])
        ys.append(np.asarray(y)[0])
        neus.append(bool(np.asarray(neu)[0]))
        P = G.double(P)
    data = codec.serialize((jnp.asarray(np.stack(xs)),
                            jnp.asarray(np.stack(ys))), np.asarray(neus))
    for i, expected in enumerate(EXPECTED_BIT_STRINGS):
        assert data[i * 32:(i + 1) * 32].hex() == expected, i


def test_deserialize_roundtrip(ctx, codec):
    data = b"".join(bytes.fromhex(s) for s in EXPECTED_BIT_STRINGS)
    (x, y), neu, ok = codec.deserialize(data)
    assert np.asarray(ok).all()
    assert not np.asarray(neu).any()
    out = codec.serialize((x, y), np.asarray(neu))
    assert out == data
    # two-torsion flip: serializing P and P+(0,-1) gives identical bytes
    G = ctx.group
    fp = ctx.fp
    n = x.shape[0]
    tor = (fp.broadcast_zero((n,)), fp.neg(fp.broadcast_one((n,))))
    P = G.from_affine((x, y))
    P2 = G.madd(P, tor)
    (x2, y2), neu2 = G.to_affine(P2)
    assert codec.serialize((x2, y2), np.asarray(neu2)) == data


def test_deserialize_rejects(codec):
    ctx = codec.ctx
    # x >= p rejected
    bad = (ctx.p + 5).to_bytes(32, "big")
    _, _, ok = codec.deserialize(bad)
    assert not np.asarray(ok).any()
    # x with no curve point / not in subgroup rejected
    bad2 = (2).to_bytes(32, "big")
    _, _, ok2 = codec.deserialize(bad2)
    assert not np.asarray(ok2).any()
    # all-zero accepted as neutral
    (x, y), neu, ok3 = codec.deserialize(b"\x00" * 32)
    assert np.asarray(ok3).all() and np.asarray(neu).all()


def test_map_to_scalar_field(codec):
    # jsign/verkle-test-vectors 002_map_to_field_element
    # (t_ethereum_verkle_primitives.nim:356-368)
    data = bytes.fromhex(
        "524996a95838712c4580220bb3de453d76cffd7f732f89914d4417bc8e99b513")
    (x, y), neu, ok = codec.deserialize(data)
    assert np.asarray(ok).all()
    out = codec.map_to_scalar_field((x, y))
    from constantine_tpu.ops import limbs as lb
    got = lb.limbs_to_int(np.asarray(out)[0])
    assert got == int(
        "038ae85a1376b72642f6694eb4238e3f1348253498e2bf4daec9e77024ae8b07",
        16)


def test_transcript_vectors(ipa):
    r = ipa.r
    # go-ipa vector 1 (t_ethereum_verkle_ipa_primitives.nim:291-305)
    tr = Transcript(b"simple_protocol", r)
    c1 = tr.squeeze(b"simple_challenge")
    assert c1.to_bytes(32, "little").hex() == (
        "c2aa02607cbdf5595f00ee0dd94a2bbff0bed6a2bf8452ada9011eadb538d003")
    # determinism
    tr_a = Transcript(b"simple_protocol", r)
    tr_b = Transcript(b"simple_protocol", r)
    assert (tr_a.squeeze(b"ethereum_challenge")
            == tr_b.squeeze(b"ethereum_challenge"))
    # compound absorbs (vector :334-353)
    tr2 = Transcript(b"simple_protocol", r)
    tr2.absorb_scalar(b"five", 5)
    tr2.absorb_scalar(b"five again", 5)
    c2 = tr2.squeeze(b"simple_challenge")
    assert c2.to_bytes(32, "little").hex() == (
        "498732b694a8ae1622d4a9347535be589e4aee6999ffc0181d13fe9e4d037b0b")
    # signed scalars + domain separators (:357-386)
    tr3 = Transcript(b"simple_protocol", r)
    tr3.absorb_scalar(b"-1", r - 1)
    tr3.domain_separator(b"separate me")
    tr3.absorb_scalar(b"-1 again", r - 1)
    tr3.domain_separator(b"separate me again")
    tr3.absorb_scalar(b"now 1", 1)
    c3 = tr3.squeeze(b"simple_challenge")
    assert c3.to_bytes(32, "little").hex() == (
        "14f59938e9e9b1389e74311a464f45d3d88d8ac96adf1c1129ac466de088d618")
    # point absorb (:390-399)
    tr4 = Transcript(b"simple_protocol", r)
    gen_bytes = ipa._point_bytes(
        tuple(t[0] for t in ipa.G.from_affine(ipa.ctx.gen)))
    tr4.absorb_point(b"generator", gen_bytes)
    c4 = tr4.squeeze(b"simple_challenge")
    assert c4.to_bytes(32, "little").hex() == (
        "8c2dafe7c0aabfa9ed542bb2cbf0568399ae794fc44fdfd7dff6cc0e6144921c")


def _test_poly_256(vals):
    out = list(vals) + [0] * (256 - len(vals))
    return out


def test_ipa_proof_consistency(ipa):
    # t_ethereum_verkle_ipa_primitives.nim:474-538 (go-ipa vectors)
    poly = _test_poly_256(list(range(1, 33)) * 8)
    C = ipa.commit_bytes(poly)
    assert C.hex() == (
        "1b9dff8f5ebbac250d291dfe90e36283a227c64b113c37f1bfb9e7a743cdb128")
    tr = Transcript(b"test", ipa.r)
    proof, y = ipa.prove(tr, poly, C, 2101)
    assert y.to_bytes(32, "little").hex() == (
        "4a353e70b03c89f161de002e8713beec0d740a5e20722fd5bd68b30540a33208")
    state = tr.squeeze(b"state")
    assert state.to_bytes(32, "little").hex() == (
        "0a81881cbfd7d7197a54ebd67ed6a68b5867f3c783706675b34ece43e85e7306")
    # verification
    trv = Transcript(b"test", ipa.r)
    assert ipa.verify(trv, C, 2101, y, proof)


def test_ipa_verify_ignacio_vector(ipa):
    # t_ethereum_verkle_ipa_primitives.nim:412-450 + test_helper consts
    C = bytes.fromhex(
        "68a798550a3e2ea3a2a91e1307e4ef06fb35d8df543f903ce9ea4edd75de7706")
    proof_bytes = bytes.fromhex(
        "0000000000000000000000000000000000000000000000000000000000000000"
        "0000000000000000000000000000000000000000000000000000000000000000"
        "0000000000000000000000000000000000000000000000000000000000000000"
        "0000000000000000000000000000000000000000000000000000000000000000"
        "2d3e383cf2ca36482707617daf4230f2261cff2abeb98a7d1e139cf386970f7a"
        "67cea4e0dcf8c437e5cd9852d95613a255ef625412a3ac7fb1a0d27227a32a7c"
        "1292f14b7c189f033c91217f02b34c7832958afc7ae3bb498b29ca08277dc60d"
        "1c53bb5f07280c16238a7f99c059cbbdbbc933bef4b74d604721a09b526aac17"
        "51a4bdf0df2d303418e7e5642ac4aacc730625514c87a4bcce5369cc4c1e1d2a"
        "1ee9125e09db763e7d99fa857928fabeb94ba822d5cf1cc8f5be372683ee7089"
        "082c0ca302a243f0124cc25319d069e0c689f03e4cb32e266fffd4b8c9a5e1cb"
        "2c708dc7960531ecea4331e376d7f6604228fc0606a08bda95ee3350c8bca83f"
        "37b23160af7bae3db95f0c66ed4535fc5397b43dcdc1d09c1e3a0376a6705d91"
        "6d96cb64feb47d00ebf1ddbad7eaf3b5d8c381d31098c5c8a909793bd6063c2f"
        "0450320af78de387938261eba3e984271f31c3f71a55b33631b90505f8209b38"
        "4aa55feb1c1c72a5e2abce15f24eb18715a309f5517ac3079c64c8ff157d3e35"
        "d5bad17b86f9599b1e34f1f4b7c6600a83913261645a0811fba0ad1ed104fe0c")
    proof = ipa.deserialize_proof(proof_bytes)
    assert proof is not None
    tr = Transcript(b"ipa", ipa.r)
    assert ipa.verify(tr, C, 13, 0x0E, proof)
    # serialization roundtrip
    assert ipa.serialize_proof(proof) == proof_bytes


def test_ipa_proof_serde(ipa):
    data = bytes.fromhex(
        "273395a8febdaed38e94c3d874e99c911a47dd84616d54c55021d5c4131b507e"
        "46a4ec2c7e82b77ec2f533994c91ca7edaef212c666a1169b29c323eabb0cf69"
        "0e0146638d0e2d543f81da4bd597bf3013e1663f340a8f87b845495598d0a395"
        "1590b6417f868edaeb3424ff174901d1185a53a3ee127fb7be0af42dda44bf99"
        "2885bde279ef821a298087717ef3f2b78b2ede7f5d2ea1b60a4195de86a530eb"
        "247fd7e456012ae9a070c61635e55d1b7a340dfab8dae991d6273d099d955281"
        "5434cc1ba7bcdae341cf7928c6f25102370bdf4b26aad3af654d9dff4b373566"
        "1db3177342de5aad774a59d3e1b12754aee641d5f9cd1ecd2751471b308d2d84"
        "10add1c9fcc5a2b7371259f0538270832a98d18151f653efbc60895fab8be965"
        "0510449081626b5cd24671d1a3253487d44f589c2ff0da3557e307e520cf4e00"
        "54bbf8bdffaa24b7e4cce5092ccae5a08281ee24758374f4e65f126cacce6405"
        "1905b5e2038060ad399c69ca6cb1d596d7c9cb5e161c7dcddc1a7ad62660dd4a"
        "5f69b31229b80e6b3df520714e4ea2b5896ebd48d14c7455e91c1ecf4acc5ffb"
        "36937c49413b7d1005dd6efbd526f5af5d61131ca3fcdae1218ce81c75e62b39"
        "100ec7f474b48a2bee6cef453fa1bc3db95c7c6575bc2d5927cbf7413181ac90"
        "5766a4038a7b422a8ef2bf7b5059b5c546c19a33c1049482b9a9093f864913ca"
        "82290decf6e9a65bf3f66bc3ba4a8ed17b56d890a83bcbe74435a42499dec115")
    proof = ipa.deserialize_proof(data)
    assert proof is not None
    assert ipa.serialize_proof(proof) == data
    # a0 >= r must fail (reference :231-256)
    bad = data[:512] + (ipa.r).to_bytes(32, "little")
    assert ipa.deserialize_proof(bad) is None
    assert ipa.deserialize_proof(data[:-1]) is None


def test_multiproof_consistency(ipa):
    # t_ethereum_verkle_ipa_primitives.nim:599-667 (go-ipa vector)
    poly1 = _test_poly_256(list(range(1, 33)) * 8)
    poly2 = _test_poly_256(list(range(32, 0, -1)) * 8)
    C1 = ipa.commit_bytes(poly1)
    C2 = ipa.commit_bytes(poly2)
    tr = Transcript(b"test", ipa.r)
    proof = ipa.multi_prove(tr, [poly1, poly2], [C1, C2], [0, 0])
    state = tr.squeeze(b"state")
    assert state.to_bytes(32, "little").hex() == (
        "eee8a80357ff74b766eba39db90797d022e8d6dee426ded71234241be504d519")
    # verify
    trv = Transcript(b"test", ipa.r)
    ys = [poly1[0], poly2[0]]
    assert ipa.multi_verify(trv, [C1, C2], [0, 0], ys, proof)
    # tampered eval rejected
    trv2 = Transcript(b"test", ipa.r)
    assert not ipa.multi_verify(trv2, [C1, C2], [0, 0],
                                [poly1[0] + 1, poly2[0]], proof)


def test_multiproof_serde(ipa):
    poly = _test_poly_256([1, 1, 1, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14])
    C = ipa.commit_bytes(poly)
    tr = Transcript(b"multiproof", ipa.r)
    proof = ipa.multi_prove(tr, [poly], [C], [7])
    data = ipa.serialize_multiproof(proof)
    assert len(data) == 576
    proof2 = ipa.deserialize_multiproof(data)
    assert proof2 is not None
    trv = Transcript(b"multiproof", ipa.r)
    assert ipa.multi_verify(trv, [C], [7], [poly[7]], proof2)
