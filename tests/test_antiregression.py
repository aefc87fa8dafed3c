"""Anti-regression / adversarial edge-case suite.

The reference keeps dedicated files for past bugs and pathological inputs
(tests/math_extension_fields/t_fp12_anti_regression.nim,
t_ec_shortw_jac_g2_msm_bug_366.nim, t_ec_shortw_prj_edge_case_345.nim).
This file is the same convention for this codebase: each test pins an
input class that once crashed or silently mis-computed during rounds 1-4
development, or that stresses a degenerate branch of the complete-by-
masking group law. Everything here must stay FAST (no pairing/MSM-scale
compiles): field/tower/EC/codec level only.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve


@pytest.fixture(scope="module")
def ctx():
    return get_curve("BLS12_381")


def test_field_edge_values(ctx):
    """0/1/p-1 through every arithmetic path (the reference's
    t_finite_fields edge sweep)."""
    F = ctx.fp
    p = ctx.p
    vals = [0, 1, p - 1, p - 2, (p - 1) // 2, (p + 1) // 2]
    a = jnp.asarray(F.encode(vals))
    n = len(vals)
    # neg(0) == 0 (the masked branch of neg)
    assert F.decode(F.neg(a))[:1] == [0]
    # a + (p-1-a) == p-1 ; a - a == 0 ; double/div2 roundtrip
    b = jnp.asarray(F.encode([(p - 1 - v) % p for v in vals]))
    assert F.decode(F.add(a, b)) == [p - 1] * n
    assert F.decode(F.sub(a, a)) == [0] * n
    assert F.decode(F.div2(F.double(a))) == vals
    # mul against host ints incl. (p-1)^2
    got = F.decode(F.mul(a, a))
    assert got == [v * v % p for v in vals]
    # inv(0) convention: Fermat chain maps 0 -> 0 (no crash, no secret
    # branch); inv(1) == 1
    inv = F.decode(F.inv(a))
    assert inv[0] == 0 and inv[1] == 1
    assert inv[2] == pow(p - 1, -1, p)


def test_fp12_sparse_components(ctx):
    """Fp12 elements with zero sub-towers — the t_fp12_anti_regression
    class (sparse operands once hit a wrong-nonresidue fold)."""
    from constantine_tpu.ops.towers import build_tower
    from constantine_tpu.utils import refmath as rm
    fp2, fp6, fp12 = build_tower("BLS12_381")
    p = ctx.p
    nr = ctx.params.fp2_nonresidue
    xi = ctx.params.fp6_nonresidue
    rng = np.random.default_rng(42)

    def f2(a, b):
        return rm.fp2_mul(a, b, nr, p)

    def f2add(a, b):
        return ((a[0] + b[0]) % p, (a[1] + b[1]) % p)

    def xi_mul(a):
        return f2(xi, a)

    def fp6_mul_host(a, b):
        # (a0 + a1 v + a2 v^2)(b0 + ...) with v^3 = xi; a, b: 3 Fp2 pairs
        c = [(0, 0)] * 5
        for i in range(3):
            for j in range(3):
                c[i + j] = f2add(c[i + j], f2(a[i], b[j]))
        return [f2add(c[0], xi_mul(c[3])), f2add(c[1], xi_mul(c[4])), c[2]]

    def v_mul(a):        # v * (a0 + a1 v + a2 v^2) = xi a2 + a0 v + a1 v^2
        return [xi_mul(a[2]), a[0], a[1]]

    def fp12_mul_host(ca, cb):
        A = [[tuple(ca[2 * k: 2 * k + 2]) for k in range(3)],
             [tuple(ca[6 + 2 * k: 8 + 2 * k]) for k in range(3)]]
        B = [[tuple(cb[2 * k: 2 * k + 2]) for k in range(3)],
             [tuple(cb[6 + 2 * k: 8 + 2 * k]) for k in range(3)]]
        c0 = [f2add(x, y) for x, y in
              zip(fp6_mul_host(A[0], B[0]), v_mul(fp6_mul_host(A[1], B[1])))]
        c1 = [f2add(x, y) for x, y in
              zip(fp6_mul_host(A[0], B[1]), fp6_mul_host(A[1], B[0]))]
        return [v for pair in c0 for v in pair] +                [v for pair in c1 for v in pair]

    def rand_sparse(zero_slots):
        c = [int(v) % p for v in rng.integers(1, 2**62, size=12)]
        for z in zero_slots:
            c[z] = 0
        return c

    cases = [
        rand_sparse(range(1, 12)),       # only c0 (an Fp element)
        rand_sparse(range(2, 12)),       # an Fp2 element embedded
        rand_sparse(range(6, 12)),       # c1 tower zero (Fp6 embedded)
        rand_sparse(range(0, 6)),        # c0 tower zero (pure w-part)
        rand_sparse([0, 3, 5, 7, 9]),    # scattered zeros
    ]
    for cs in cases:
        ds = rand_sparse([])
        a = fp12.encode(cs)[None]
        b = fp12.encode(ds)[None]
        got = fp12.decode(fp12.mul(jnp.asarray(a), jnp.asarray(b)))[0]
        want = fp12_mul_host(cs, ds)
        assert got == want, cs
        # square == mul(a, a) on sparse inputs
        gs = fp12.decode(fp12.square(jnp.asarray(a)))
        gm = fp12.decode(fp12.mul(jnp.asarray(a), jnp.asarray(a)))
        assert gs == gm


def test_ec_degenerate_additions(ctx):
    """P + (-P), P + P via add (not double), inf absorbing — the
    complete-by-masking law's degenerate branches (the bug-366/edge-345
    class: MSM buckets hit exactly these)."""
    G = ctx.g1
    from constantine_tpu.utils import refmath as rm
    pts = [rm.ec_mul(k, ctx.g, 0, ctx.p) for k in (1, 2, 5)]
    px = jnp.asarray(ctx.fp.encode([q[0] for q in pts]))
    py = jnp.asarray(ctx.fp.encode([q[1] for q in pts]))
    P = G.from_affine((px, py))
    negP = G.neg(P)
    # P + (-P) = inf
    assert np.asarray(G.is_inf(G.add(P, negP))).all()
    # P + P via generic add == double
    s = G.add(P, P)
    d = G.double(P)
    (sx, sy), sinf = G.to_affine(s)
    (dx, dy), dinf = G.to_affine(d)
    assert ctx.fp.decode(sx) == ctx.fp.decode(dx)
    assert ctx.fp.decode(sy) == ctx.fp.decode(dy)
    # inf + P = P (both argument orders)
    inf = G.infinity((3,))
    for got in (G.add(inf, P), G.add(P, inf)):
        (gx, gy), gi = G.to_affine(got)
        assert not np.asarray(gi).any()
        assert ctx.fp.decode(gx) == [q[0] for q in pts]
    # madd with the SAME affine point (doubling through the mixed path)
    m = G.madd(P, (px, py))
    (mx, my), _ = G.to_affine(m)
    assert ctx.fp.decode(mx) == ctx.fp.decode(dx)


def test_codec_rejection_branches(ctx):
    """Every rejection branch of the ZCash G1 codec
    (codecs_bls12_381.nim:183 deserialize error paths)."""
    from constantine_tpu.utils.serialization import get_codec
    codec = get_codec()
    p = ctx.p
    good = codec.g1_compress((jnp.asarray(ctx.fp.encode([ctx.g[0]])),
                              jnp.asarray(ctx.fp.encode([ctx.g[1]]))))
    assert codec.g1_decompress(good)[2].all()

    def mut(b: bytes, i: int, v: int) -> bytes:
        ba = bytearray(b)
        ba[i] = v
        return bytes(ba)

    # compression bit cleared (uncompressed flag) must be rejected by the
    # compressed-codec path
    bad1 = mut(good, 0, good[0] & 0x3F)
    assert not codec.g1_decompress(bad1)[2].any()
    # x >= p (non-canonical field encoding)
    xbig = (0b100 << 381) | (p + 1)
    bad2 = xbig.to_bytes(48, "big")
    assert not codec.g1_decompress(bad2)[2].any()
    # infinity flag with nonzero x
    bad3 = mut(good, 0, good[0] | 0x40)
    assert not codec.g1_decompress(bad3)[2].any()
    # x not on curve (x=4 gives non-residue x^3+4 ... pick x with no sqrt)
    for xv in range(2, 30):
        if pow((xv**3 + 4) % p, (p - 1) // 2, p) != 1:
            bad4 = ((0b100 << 381) | xv).to_bytes(48, "big")
            assert not codec.g1_decompress(bad4)[2].any()
            break


def test_msm_digits_boundary_scalars(ctx):
    """Signed-digit recoding at the carry-chain boundary: scalars of the
    form sum 2^(16k) * 0x8000 (every window exactly 'half', maximal carry
    propagation through the Kogge-Stone signed-digit scan)."""
    from constantine_tpu.ops.msm import _signed_digits
    r = ctx.r
    half_all = int("8000" * 15, 16)
    tricky = [0, 1, r - 1, half_all % r, (1 << 255) % r,
              int("ffff" * 15, 16) % r]
    sl = jnp.asarray(ctx.scalars_to_limbs(tricky))
    for c in (4, 12, 13, 16):
        W = -(-255 // c) + 1
        dig = np.asarray(_signed_digits(sl, c, W))
        half = 1 << (c - 1)
        assert (np.abs(dig) <= half).all()
        # reconstruction: sum digit * 2^(c*w) == scalar
        for j, k in enumerate(tricky):
            v = sum(int(dig[w, j]) << (c * w) for w in range(W))
            assert v == k, (c, k)
