"""Ethereum EVM precompiles.

Re-design of constantine/ethereum_evm_precompiles.nim:59-1185:
* 0x02 SHA256, 0x03 RIPEMD160, 0x05 MODEXP (EIP-198/2565),
* BN254 (alt_bn128): 0x06 ecAdd, 0x07 ecMul, 0x08 ecPairing (EIP-196/197),
* EIP-2537 BLS12-381: G1/G2 add, MSM, pairing check, map-to-curve.

Conventions: every function returns the output bytes, or None on invalid
input (the EVM revert semantics of the reference's CttEVMStatus).

MODEXP runs on CPython's native bignum pow — the host-native equivalent of
the reference's arbitrary-precision stack
(constantine/math_arbitrary_precision/arithmetic/*.nim); there is no batch
axis in the EVM interface, so the device has nothing to win here.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..named.precompute import get_curve
from ..ops import limbs as lb
from ..ops.msm import msm
from ..ops.pairing import get_pairing
from ..utils.hashes import ripemd160, sha256


# ---------------------------------------------------------------------------
# Hash precompiles (0x02 / 0x03)
# ---------------------------------------------------------------------------


def eth_evm_sha256(data: bytes) -> bytes:
    return sha256(data)


def eth_evm_ripemd160(data: bytes) -> bytes:
    return b"\x00" * 12 + ripemd160(data)


# ---------------------------------------------------------------------------
# MODEXP (0x05, EIP-198 / EIP-2565)
# ---------------------------------------------------------------------------


def eth_evm_modexp(data: bytes) -> bytes:
    data = data + b"\x00" * max(0, 96 - len(data))
    b_len = int.from_bytes(data[0:32], "big")
    e_len = int.from_bytes(data[32:64], "big")
    m_len = int.from_bytes(data[64:96], "big")
    if max(b_len, e_len, m_len) > 1 << 20:  # sanity bound
        return None
    body = data[96:] + b"\x00" * (b_len + e_len + m_len)
    base = int.from_bytes(body[:b_len], "big")
    exp = int.from_bytes(body[b_len:b_len + e_len], "big")
    mod = int.from_bytes(body[b_len + e_len:b_len + e_len + m_len], "big")
    if m_len == 0:
        return b""
    if mod == 0:
        return b"\x00" * m_len
    return pow(base, exp, mod).to_bytes(m_len, "big")


# ---------------------------------------------------------------------------
# BN254 (EIP-196/197): 0x06 add, 0x07 mul, 0x08 pairing
# ---------------------------------------------------------------------------


def _bn_parse_g1(data: bytes):
    """64 bytes -> ((x, y) ints, ok). Point must be on curve or (0,0)=inf."""
    ctx = get_curve("BN254_Snarks")
    x = int.from_bytes(data[0:32], "big")
    y = int.from_bytes(data[32:64], "big")
    if x >= ctx.p or y >= ctx.p:
        return None, False, False
    if x == 0 and y == 0:
        return (0, 0), True, True
    on = (y * y - (x * x * x + 3)) % ctx.p == 0
    return (x, y), on, False


def _bn_serialize_g1(pt, is_inf) -> bytes:
    if is_inf:
        return b"\x00" * 64
    return pt[0].to_bytes(32, "big") + pt[1].to_bytes(32, "big")


def eth_evm_bn254_g1add(data: bytes) -> bytes:
    data = (data + b"\x00" * 128)[:128]
    P, ok1, inf1 = _bn_parse_g1(data[:64])
    Q, ok2, inf2 = _bn_parse_g1(data[64:128])
    if not (ok1 and ok2):
        return None
    from ..utils import refmath as rm
    ctx = get_curve("BN254_Snarks")
    a = rm.ec_add(None if inf1 else P, None if inf2 else Q, 0, ctx.p)
    return _bn_serialize_g1(a, a is None)


def eth_evm_bn254_g1mul(data: bytes) -> bytes:
    data = (data + b"\x00" * 96)[:96]
    P, ok, inf = _bn_parse_g1(data[:64])
    if not ok:
        return None
    k = int.from_bytes(data[64:96], "big")
    from ..utils import refmath as rm
    ctx = get_curve("BN254_Snarks")
    a = None if inf else rm.ec_mul(k % ctx.r, P, 0, ctx.p)
    return _bn_serialize_g1(a, a is None)


def _bn_parse_g2(data: bytes):
    """128 bytes (x_im, x_re, y_im, y_re big-endian!) -> Fp2 point or inf."""
    ctx = get_curve("BN254_Snarks")
    xi = int.from_bytes(data[0:32], "big")
    xr = int.from_bytes(data[32:64], "big")
    yi = int.from_bytes(data[64:96], "big")
    yr = int.from_bytes(data[96:128], "big")
    if max(xi, xr, yi, yr) >= ctx.p:
        return None, False, False
    if xi == xr == yi == yr == 0:
        return None, True, True
    from ..utils import refmath as rm
    nr = ctx.params.fp2_nonresidue
    x, y = (xr, xi), (yr, yi)
    bp = ctx.g2_b()
    lhs = rm.fp2_mul(y, y, nr, ctx.p)
    rhs = rm.fp2_add(rm.fp2_mul(x, rm.fp2_mul(x, x, nr, ctx.p), nr, ctx.p),
                     bp, ctx.p)
    if lhs != rhs:
        return None, False, False
    # subgroup check (required by EIP-197): [r]Q == inf
    if rm.ec2_mul(ctx.r, (x, y), (0, 0), nr, ctx.p) is not None:
        return None, False, False
    return (x, y), True, False


def eth_evm_bn254_ecpairingcheck(data: bytes) -> bytes:
    """0x08: product of pairings == 1 -> 32-byte 0/1. Input: k*192 bytes."""
    if len(data) % 192 != 0:
        return None
    k = len(data) // 192
    if k == 0:
        return (1).to_bytes(32, "big")
    pr = get_pairing("BN254_Snarks")
    ctx = pr.ctx
    g1s, g2s, skips = [], [], []
    for i in range(k):
        chunk = data[i * 192:(i + 1) * 192]
        P, ok1, inf1 = _bn_parse_g1(chunk[:64])
        Q, ok2, inf2 = _bn_parse_g2(chunk[64:192])
        if not (ok1 and ok2):
            return None
        skips.append(inf1 or inf2)
        g1s.append(P if not inf1 else (0, 0))
        g2s.append(Q if not inf2 else ((0, 0), (0, 0)))
    # pad skipped slots with valid generator coords (ignored via skip mask)
    g1s = [(p if not s else (ctx.g[0], ctx.g[1]))
           for p, s in zip(g1s, skips)]
    g2s = [(q if not s else (ctx.params.g2_gx, ctx.params.g2_gy))
           for q, s in zip(g2s, skips)]
    px = jnp.asarray(ctx.fp.encode([p[0] for p in g1s]))
    py = jnp.asarray(ctx.fp.encode([p[1] for p in g1s]))
    qx = jnp.asarray(np.stack([pr.fp2.encode(list(q[0])) for q in g2s]))
    qy = jnp.asarray(np.stack([pr.fp2.encode(list(q[1])) for q in g2s]))
    ok = bool(np.asarray(pr.pairing_check(
        (px, py), (qx, qy), skip_mask=jnp.asarray(skips))))
    return int(ok).to_bytes(32, "big")


# ---------------------------------------------------------------------------
# EIP-2537: BLS12-381 precompiles (64-byte-padded field elements)
# ---------------------------------------------------------------------------

_BLS = "BLS12_381"


def _bls_parse_fp(chunk: bytes):
    """64 bytes: top 16 must be zero, value < p."""
    ctx = get_curve(_BLS)
    if chunk[:16] != b"\x00" * 16:
        return None
    v = int.from_bytes(chunk[16:64], "big")
    if v >= ctx.p:
        return None
    return v


def _bls_fp_bytes(v: int) -> bytes:
    return b"\x00" * 16 + v.to_bytes(48, "big")


def _bls_parse_g1(data: bytes, subgroup: bool):
    """128 bytes (x, y) -> ((x, y), inf, ok) python ints."""
    ctx = get_curve(_BLS)
    x = _bls_parse_fp(data[:64])
    y = _bls_parse_fp(data[64:128])
    if x is None or y is None:
        return None, False, False
    if x == 0 and y == 0:
        return (0, 0), True, True
    if (y * y - (x**3 + 4)) % ctx.p != 0:
        return None, False, False
    if subgroup:
        from ..utils import refmath as rm
        if rm.ec_mul(ctx.r, (x, y), 0, ctx.p) is not None:
            return None, False, False
    return (x, y), False, True


def _bls_g1_bytes(pt, inf) -> bytes:
    if inf:
        return b"\x00" * 128
    return _bls_fp_bytes(pt[0]) + _bls_fp_bytes(pt[1])


def eth_evm_bls12381_g1add(data: bytes) -> bytes:
    if len(data) != 256:
        return None
    P, inf1, ok1 = _bls_parse_g1(data[:128], subgroup=False)
    Q, inf2, ok2 = _bls_parse_g1(data[128:], subgroup=False)
    if not (ok1 and ok2):
        return None
    from ..utils import refmath as rm
    ctx = get_curve(_BLS)
    a = rm.ec_add(None if inf1 else P, None if inf2 else Q, 0, ctx.p)
    return _bls_g1_bytes(a, a is None)


def eth_evm_bls12381_g1msm(data: bytes) -> bytes:
    """G1 MSM: k * (128B point + 32B scalar). Subgroup checks required."""
    if len(data) == 0 or len(data) % 160 != 0:
        return None
    k = len(data) // 160
    ctx = get_curve(_BLS)
    pts, scalars, infs = [], [], []
    for i in range(k):
        chunk = data[i * 160:(i + 1) * 160]
        P, inf, ok = _bls_parse_g1(chunk[:128], subgroup=True)
        if not ok:
            return None
        pts.append(P if not inf else (ctx.g[0], ctx.g[1]))
        scalars.append(0 if inf else int.from_bytes(chunk[128:160], "big"))
        infs.append(inf)
    px = jnp.asarray(ctx.fp.encode([p[0] for p in pts]))
    py = jnp.asarray(ctx.fp.encode([p[1] for p in pts]))
    sl = jnp.asarray(ctx.scalars_to_limbs([s % ctx.r for s in scalars]))
    R = msm(ctx.g1, (px, py), sl, scalar_bits=255)
    (x, y), inf = ctx.g1.to_affine(tuple(t[None] for t in R))
    if bool(np.asarray(inf)[0]):
        return b"\x00" * 128
    return _bls_g1_bytes((ctx.fp.decode(x)[0] if isinstance(ctx.fp.decode(x), list) else ctx.fp.decode(x),
                          ctx.fp.decode(y)[0] if isinstance(ctx.fp.decode(y), list) else ctx.fp.decode(y)), False)


def _bls_parse_g2(data: bytes, subgroup: bool):
    """256 bytes (x_c0, x_c1, y_c0, y_c1) -> (((x),(y)), inf, ok)."""
    ctx = get_curve(_BLS)
    vals = [_bls_parse_fp(data[i * 64:(i + 1) * 64]) for i in range(4)]
    if any(v is None for v in vals):
        return None, False, False
    x = (vals[0], vals[1])
    y = (vals[2], vals[3])
    if all(v == 0 for v in vals):
        return ((0, 0), (0, 0)), True, True
    from ..utils import refmath as rm
    nr = ctx.params.fp2_nonresidue
    bp = ctx.g2_b()
    lhs = rm.fp2_mul(y, y, nr, ctx.p)
    rhs = rm.fp2_add(rm.fp2_mul(x, rm.fp2_mul(x, x, nr, ctx.p), nr, ctx.p),
                     bp, ctx.p)
    if lhs != rhs:
        return None, False, False
    if subgroup and rm.ec2_mul(ctx.r, (x, y), (0, 0), nr, ctx.p) is not None:
        return None, False, False
    return (x, y), False, True


def _bls_g2_bytes(pt, inf) -> bytes:
    if inf:
        return b"\x00" * 256
    (x, y) = pt
    return (_bls_fp_bytes(x[0]) + _bls_fp_bytes(x[1])
            + _bls_fp_bytes(y[0]) + _bls_fp_bytes(y[1]))


def eth_evm_bls12381_g2add(data: bytes) -> bytes:
    if len(data) != 512:
        return None
    P, inf1, ok1 = _bls_parse_g2(data[:256], subgroup=False)
    Q, inf2, ok2 = _bls_parse_g2(data[256:], subgroup=False)
    if not (ok1 and ok2):
        return None
    from ..utils import refmath as rm
    ctx = get_curve(_BLS)
    nr = ctx.params.fp2_nonresidue
    a = rm.ec2_add(None if inf1 else P, None if inf2 else Q, (0, 0), nr, ctx.p)
    return _bls_g2_bytes(a, a is None)


def eth_evm_bls12381_g2msm(data: bytes) -> bytes:
    """G2 MSM: k * (256B point + 32B scalar)."""
    if len(data) == 0 or len(data) % 288 != 0:
        return None
    k = len(data) // 288
    ctx = get_curve(_BLS)
    from ..ops.towers import build_tower
    fp2, _, _ = build_tower(_BLS)
    pts, scalars = [], []
    for i in range(k):
        chunk = data[i * 288:(i + 1) * 288]
        P, inf, ok = _bls_parse_g2(chunk[:256], subgroup=True)
        if not ok:
            return None
        pts.append(P if not inf
                   else (ctx.params.g2_gx, ctx.params.g2_gy))
        scalars.append(0 if inf
                       else int.from_bytes(chunk[256:288], "big"))
    qx = jnp.asarray(np.stack([fp2.encode(list(p[0])) for p in pts]))
    qy = jnp.asarray(np.stack([fp2.encode(list(p[1])) for p in pts]))
    sl = jnp.asarray(ctx.scalars_to_limbs([s % ctx.r for s in scalars]))
    R = msm(ctx.g2, (qx, qy), sl, scalar_bits=255)
    (x, y), inf = ctx.g2.to_affine(tuple(t[None] for t in R))
    if bool(np.asarray(inf)[0]):
        return b"\x00" * 256
    xv = fp2.decode(x)[0]
    yv = fp2.decode(y)[0]
    return _bls_g2_bytes(((xv[0], xv[1]), (yv[0], yv[1])), False)


def eth_evm_bls12381_pairingcheck(data: bytes) -> bytes:
    """k * (128B G1 + 256B G2) -> 32-byte 0/1. Subgroup checks required."""
    if len(data) == 0 or len(data) % 384 != 0:
        return None
    k = len(data) // 384
    pr = get_pairing(_BLS)
    ctx = pr.ctx
    g1s, g2s, skips = [], [], []
    for i in range(k):
        chunk = data[i * 384:(i + 1) * 384]
        P, inf1, ok1 = _bls_parse_g1(chunk[:128], subgroup=True)
        Q, inf2, ok2 = _bls_parse_g2(chunk[128:384], subgroup=True)
        if not (ok1 and ok2):
            return None
        skips.append(inf1 or inf2)
        g1s.append(P if not inf1 else (ctx.g[0], ctx.g[1]))
        g2s.append(Q if not inf2 else (ctx.params.g2_gx, ctx.params.g2_gy))
    px = jnp.asarray(ctx.fp.encode([p[0] for p in g1s]))
    py = jnp.asarray(ctx.fp.encode([p[1] for p in g1s]))
    qx = jnp.asarray(np.stack([pr.fp2.encode(list(q[0])) for q in g2s]))
    qy = jnp.asarray(np.stack([pr.fp2.encode(list(q[1])) for q in g2s]))
    ok = bool(np.asarray(pr.pairing_check(
        (px, py), (qx, qy), skip_mask=jnp.asarray(skips))))
    return int(ok).to_bytes(32, "big")


def eth_evm_bls12381_map_fp_to_g1(data: bytes) -> bytes:
    """EIP-2537 map: clear_cofactor(sswu_map(fp)). 64B in, 128B out."""
    if len(data) != 64:
        return None
    v = _bls_parse_fp(data)
    if v is None:
        return None
    from .hash_to_curve import get_h2c
    h2c = get_h2c()
    ctx = h2c.ctx
    u = jnp.asarray(ctx.fp.encode([v]))
    x, y = h2c.g1_map.map_to_curve(u)
    P = h2c._clear_g1(ctx.g1.from_affine((x, y)))
    (ax, ay), inf = ctx.g1.to_affine(P)
    if bool(np.asarray(inf)[0]):
        return b"\x00" * 128
    return _bls_g1_bytes((ctx.fp.decode(ax)[0], ctx.fp.decode(ay)[0]), False)


def eth_evm_bls12381_map_fp2_to_g2(data: bytes) -> bytes:
    """128B Fp2 in, 256B G2 out."""
    if len(data) != 128:
        return None
    c0 = _bls_parse_fp(data[:64])
    c1 = _bls_parse_fp(data[64:])
    if c0 is None or c1 is None:
        return None
    from .hash_to_curve import get_h2c
    from ..ops.towers import build_tower
    h2c = get_h2c()
    ctx = h2c.ctx
    fp2, _, _ = build_tower(_BLS)
    u = jnp.asarray(fp2.encode([c0, c1]))[None]
    x, y = h2c.g2_map.map_to_curve(u)
    P = h2c._clear_g2(ctx.g2.from_affine((x, y)))
    (ax, ay), inf = ctx.g2.to_affine(P)
    if bool(np.asarray(inf)[0]):
        return b"\x00" * 256
    xv = fp2.decode(ax)[0]
    yv = fp2.decode(ay)[0]
    return _bls_g2_bytes(((xv[0], xv[1]), (yv[0], yv[1])), False)
