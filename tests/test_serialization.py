"""Codec tests: compressed G1/G2 roundtrips, flag handling, canonicality.

Mirrors tests/t_codecs_bls12_381-ish coverage in the reference
(serialization/codecs_bls12_381.nim:59-276)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.utils.serialization import get_codec
from constantine_tpu.utils import refmath as rm


G1_GEN_COMPRESSED = bytes.fromhex(
    "97f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
    "6c55e83ff97a1aeffb3af00adb22c6bb")
G2_GEN_COMPRESSED = bytes.fromhex(
    "93e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
    "334cf11213945d57e5ac7d055d042b7e024aa2b2f08f0a91260805272dc51051"
    "c6e47ad4fa403b02b4510b647ae3d1770bac0326a805bbefd48056c8c121bdb8")


def test_g1_known_generator():
    codec = get_codec()
    (x, y), inf, ok = codec.g1_decompress(G1_GEN_COMPRESSED)
    assert np.asarray(ok).all() and not np.asarray(inf).any()
    ctx = get_curve("BLS12_381")
    assert codec.fp.decode(x) == [ctx.g[0]]
    assert codec.fp.decode(y) == [ctx.g[1]]
    # roundtrip
    assert codec.g1_compress((x, y)) == G1_GEN_COMPRESSED


def test_g2_known_generator():
    codec = get_codec()
    (x, y), inf, ok = codec.g2_decompress(G2_GEN_COMPRESSED)
    assert np.asarray(ok).all() and not np.asarray(inf).any()
    ctx = get_curve("BLS12_381")
    assert codec.fp2.decode(x)[0] == list(ctx.params.g2_gx)
    assert codec.fp2.decode(y)[0] == list(ctx.params.g2_gy)
    assert codec.g2_compress((x, y)) == G2_GEN_COMPRESSED


def test_g1_roundtrip_random():
    codec = get_codec()
    ctx = get_curve("BLS12_381")
    rng = random.Random(3)
    ks = [rng.randrange(1, ctx.r) for _ in range(8)]
    pts = [rm.ec_mul(k, ctx.g, 0, ctx.p) for k in ks]
    x = jnp.asarray(ctx.fp.encode([p[0] for p in pts]))
    y = jnp.asarray(ctx.fp.encode([p[1] for p in pts]))
    data = codec.g1_compress((x, y))
    (x2, y2), inf, ok = codec.g1_decompress(data)
    assert np.asarray(ok).all()
    assert ctx.fp.decode(x2) == [p[0] for p in pts]
    assert ctx.fp.decode(y2) == [p[1] for p in pts]


def test_g1_infinity():
    codec = get_codec()
    data = bytes([0xC0] + [0] * 47)
    (x, y), inf, ok = codec.g1_decompress(data)
    assert np.asarray(inf).all() and np.asarray(ok).all()
    # roundtrip through compress with inf mask
    out = codec.g1_compress((x, y), inf_mask=np.array([True]))
    assert out == data


def test_g1_invalid():
    codec = get_codec()
    ctx = get_curve("BLS12_381")
    # x >= p
    bad = bytearray(48)
    bad[0] = 0x9F
    bad[1:] = b"\xff" * 47
    _, _, ok = codec.g1_decompress(bytes(bad))
    assert not np.asarray(ok).any()
    # compression flag missing
    bad2 = bytearray(G1_GEN_COMPRESSED)
    bad2[0] &= 0x7F
    _, _, ok = codec.g1_decompress(bytes(bad2))
    assert not np.asarray(ok).any()
    # x = 0 non-inf: (0, ±2) IS on y^2 = x^3 + 4 but outside the subgroup
    bad3 = bytes([0x80] + [0] * 47)
    _, _, ok = codec.g1_decompress(bad3, subgroup_check=False)
    assert np.asarray(ok).all()
    _, _, ok = codec.g1_decompress(bad3, subgroup_check=True)
    assert not np.asarray(ok).any()
    # on curve but wrong subgroup: point with cofactor component
    while True:
        xi = 1
        rhs = (xi**3 + 4) % ctx.p
        yv = rm.sqrt_mod(rhs, ctx.p)
        if yv is not None:
            break
    # (1, y) is on curve; overwhelmingly likely NOT in the r-subgroup
    x = jnp.asarray(ctx.fp.encode([xi]))
    y = jnp.asarray(ctx.fp.encode([yv]))
    data = codec.g1_compress((x, y))
    _, _, ok_nosub = codec.g1_decompress(data, subgroup_check=False)
    _, _, ok_sub = codec.g1_decompress(data, subgroup_check=True)
    assert np.asarray(ok_nosub).all() and not np.asarray(ok_sub).any()


def test_scalar_canonicality():
    codec = get_codec()
    ctx = get_curve("BLS12_381")
    good = (ctx.r - 1).to_bytes(32, "big")
    bad = ctx.r.to_bytes(32, "big")
    _, v = codec.scalars_from_bytes(good + bad)
    assert list(v) == [True, False]
