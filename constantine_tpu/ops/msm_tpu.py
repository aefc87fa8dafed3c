"""TPU-kernel MSM pipeline (Pippenger over fused Pallas EC kernels).

Same algorithm family as ops/msm.py (signed windowed digits -> sort by
(window, bucket) -> bucket accumulation -> weighted bucket reduction ->
window combine; reference: ec_multi_scalar_mul.nim:256-459) but every EC
operation runs in the fused Pallas kernels of ops/pallas_ec.py and all point
data stays in planar-transposed (L, N) layout end-to-end.

Stage structure (all static shapes, one jit):
1. signed digits (W, N), flattened global keys w*(H+1)+|d|, one sort.
2. flush scan: lanes sweep K-length chunks of the sorted stream, one fused
   mixed-add per entry, emitting partial bucket sums at run boundaries
   (ops/pallas_ec.py flush_scan). This is the reference's bucket
   accumulation hot loop (schedAccumulate) with sorting standing in for the
   CycloneMSM collision scheduler.
3. fixed cascade of merge scans (Jacobian adds) until each bucket has at
   most 4 partials, then 2 masked adjacent-add tree rounds -> unique bucket
   sums. The cascade replaces a log-depth segmented tree over the whole
   stream (~8x fewer EC adds).
4. weighted bucket reduction sum_b b*B_b via the classic running-suffix
   trick, chunk-parallel: T serial steps over C*W lanes then a second-level
   pass over chunks (ops/pallas_ec.py bucket_reduce), 2 adds per bucket
   total — the TPU version of the reference's serial sweep
   (ec_multi_scalar_mul.nim:186).
5. window combine by c fused doublings per window.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as lb
from .msm import _signed_digits
from .pallas_ec import get_pallas_ec


def _cdiv(a, b):
    return -(-a // b)


def _rup(a, m):
    return _cdiv(a, m) * m


def best_window_tpu(n: int, bits: int = 255) -> int:
    """Balance flush madds (W*N) against bucket-side adds (~5*W*2^(c-1))."""
    best, bestcost = 8, float("inf")
    for c in range(8, 17):
        Wn = _cdiv(bits + 1, c)
        cost = Wn * n + 5 * Wn * (1 << (c - 1))
        if cost < bestcost:
            best, bestcost = c, cost
    return best


def msm_tpu(group, points_aff, scalars, c: int = None,
            scalar_bits: int = None, block: int = 512, digits=None):
    """MSM over the Pallas kernel path. Same contract as ops.msm.msm:
    returns a Jacobian point tuple with batch shape () in standard (.., L)
    layout. G1 over Fp only (tower fields fall back to the XLA path)."""
    F = group.F
    pec = get_pallas_ec(F, block)
    L = F.L
    px, py = points_aff
    N = px.shape[0] if scalars is None else scalars.shape[0]
    if digits is not None:
        assert c is not None
        W = digits.shape[0]
        H = 1 << (c - 1)
    else:
        bits = scalar_bits or scalars.shape[1] * 16
        if c is None:
            c = best_window_tpu(N, bits)
        W = _cdiv(bits + 1, c)
        H = 1 << (c - 1)
        digits = _signed_digits(scalars, c, W)        # (W, N) int32

    # ---- global keys + one sort ------------------------------------------
    widx = jax.lax.broadcasted_iota(jnp.int32, (W, N), 0)
    keys = jnp.where(digits == 0, 0,
                     widx * (H + 1) + jnp.abs(digits)).reshape(-1)
    neg = (digits < 0).reshape(-1)
    flat = W * N

    # flush geometry: M lanes sweeping K-length chunks
    K = int(np.clip(round(flat / 49152), 8, 64))
    M = _rup(_cdiv(flat, K), block)
    pad = M * K - flat
    if pad:
        keys = jnp.concatenate([keys, jnp.zeros((pad,), keys.dtype)])
        neg = jnp.concatenate([neg, jnp.zeros((pad,), neg.dtype)])
    order = jnp.argsort(keys)
    sk = keys[order]
    pidx = order % N                                   # point index
    sneg = neg[order]

    # gather + conditional negate in standard layout, then planar-transpose
    gx = jnp.take(px, pidx, axis=0)                    # (flat+pad, L)
    gy = jnp.take(py, pidx, axis=0)
    gy = lb.cselect(sneg & (sk > 0), _neg_std(F, gy), gy)

    # (M*K, L) -> (K, L, M): stream position p = m*K + k
    sxT = gx.reshape(M, K, L).transpose(1, 2, 0)
    syT = gy.reshape(M, K, L).transpose(1, 2, 0)
    skT = sk.reshape(M, K).T

    ekeys, ex, ey, ez = pec.flush_scan(skT, sxT, syT)  # (K+1, M) / (K+1,L,M)

    # flatten emissions lane-major (stream stays key-sorted)
    ck = ekeys.T.reshape(-1)                           # (M*(K+1),)
    cx = ex.transpose(2, 0, 1).reshape(M * (K + 1), L).T  # (L, M*(K+1))
    cy = ey.transpose(2, 0, 1).reshape(M * (K + 1), L).T
    cz = ez.transpose(2, 0, 1).reshape(M * (K + 1), L).T

    nb = W * (H + 1)
    K2 = 32

    # ---- merge cascade ----------------------------------------------------
    r = M  # max partials per bucket after the flush
    S = min(M * (K + 1), M + nb)
    while True:
        ck, cx, cy, cz, S = _compact(ck, cx, cy, cz, S)
        if r <= 4:
            break
        M2 = _rup(_cdiv(S, K2), 128)
        pad2 = M2 * K2 - S
        if pad2:
            ck = jnp.concatenate([ck, jnp.zeros((pad2,), ck.dtype)])
            cx = jnp.pad(cx, ((0, 0), (0, pad2)))
            cy = jnp.pad(cy, ((0, 0), (0, pad2)))
            cz = jnp.pad(cz, ((0, 0), (0, pad2)))
        kT = ck.reshape(M2, K2).T
        xT = cx.T.reshape(M2, K2, L).transpose(1, 2, 0)
        yT = cy.T.reshape(M2, K2, L).transpose(1, 2, 0)
        zT = cz.T.reshape(M2, K2, L).transpose(1, 2, 0)
        ekeys, ex, ey, ez = pec.merge_scan(kT, xT, yT, zT)
        ck = ekeys.T.reshape(-1)
        cx = ex.transpose(2, 0, 1).reshape(M2 * (K2 + 1), L).T
        cy = ey.transpose(2, 0, 1).reshape(M2 * (K2 + 1), L).T
        cz = ez.transpose(2, 0, 1).reshape(M2 * (K2 + 1), L).T
        r = _cdiv(r, K2) + 1
        S = min(M2 * (K2 + 1), M2 + nb)

    # ---- 2 tree rounds: inclusive segmented sum over runs (len <= 4) ------
    Sf = ck.shape[0]
    for s in (1, 2):
        prev_k = jnp.roll(ck, s)
        idx = jnp.arange(Sf, dtype=jnp.int32)
        same = (ck == prev_k) & (idx >= s) & (ck > 0)
        shX = jnp.roll(cx, s, axis=1)
        shY = jnp.roll(cy, s, axis=1)
        shZ = jnp.roll(cz, s, axis=1)
        # neutralize lanes that must not add (select keeps original)
        shZ = jnp.where(same[None, :], shZ, jnp.zeros_like(shZ))
        aX, aY, aZ = pec.add((cx, cy, cz), (shX, shY, shZ))
        cx = jnp.where(same[None, :], aX, cx)
        cy = jnp.where(same[None, :], aY, cy)
        cz = jnp.where(same[None, :], aZ, cz)

    # last entry of each run = full bucket sum
    nxt = jnp.roll(ck, -1).at[-1].set(-1)
    last = (ck != nxt) & (ck > 0)

    # ---- scatter into (T, L, W*C) bucket-reduce layout ---------------------
    T = 1 << max(2, (c - 1) // 2)                      # chunk length (pow 2)
    C = _cdiv(H, T)
    assert C * T == H, (H, T, C)
    w_of = (ck - 1) // (H + 1)
    b_of = ck - w_of * (H + 1)                         # 1..H
    h = b_of - 1
    cchunk = h // T
    tstep = (T - 1) - (h % T)                          # weight = h % T
    lane = w_of * C + cchunk
    tpos = jnp.where(last, tstep * (W * C) + lane, T * W * C)
    bx = jnp.zeros((L, T * W * C), jnp.uint32).at[:, tpos].set(cx, mode="drop")
    by = jnp.zeros((L, T * W * C), jnp.uint32).at[:, tpos].set(cy, mode="drop")
    bz = jnp.zeros((L, T * W * C), jnp.uint32).at[:, tpos].set(cz, mode="drop")
    bx = bx.reshape(L, T, W * C).transpose(1, 0, 2)
    by = by.reshape(L, T, W * C).transpose(1, 0, 2)
    bz = bz.reshape(L, T, W * C).transpose(1, 0, 2)

    (rX, rY, rZ), (wX, wY, wZ) = pec.bucket_reduce(bx, by, bz, T)
    # per chunk: run = sum_h-in-chunk B, wsum = sum (h%T) * B
    # window sum S_w = sum_c [ (c*T)*run_c + wsum_c + run_c ]
    #              = T * A_w + WS_w + R_w
    # A_w = sum_c c*run_c  (level-2 weighted pass, chunks reversed so the
    # kernel's descending local weight equals c), R_w = sum_c run_c,
    # WS_w = sum_c wsum_c.
    def to_lvl2(x, rev):
        v = x.reshape(L, W, C)
        if rev:
            v = v[:, :, ::-1]
        return v.transpose(2, 0, 1)                    # (C, L, W)

    (r2X, r2Y, r2Z), (a2X, a2Y, a2Z) = pec.bucket_reduce(
        to_lvl2(rX, True), to_lvl2(rY, True), to_lvl2(rZ, True), C)
    (s2X, s2Y, s2Z), _ = pec.bucket_reduce(
        to_lvl2(wX, False), to_lvl2(wY, False), to_lvl2(wZ, False), C)

    logT = int(np.log2(T))
    tA = pec.double_k((a2X, a2Y, a2Z), logT)           # (L, W)
    t1 = pec.add(tA, (s2X, s2Y, s2Z))
    wsum = pec.add(t1, (r2X, r2Y, r2Z))                # (L, W) window sums

    # ---- window combine: total = ((S_top * 2^c + S_{w-1}) * 2^c + ...) ----
    total = tuple(v[:, W - 1:W] for v in wsum)
    for w in range(W - 2, -1, -1):
        total = pec.double_k(total, c)
        total = pec.add(total, tuple(v[:, w:w + 1] for v in wsum))

    # back to standard layout, batch ()
    return tuple(t[:, 0].T.reshape(L) for t in total)


def _neg_std(F, y):
    """Field negation in standard (.., L) layout (XLA-side)."""
    d, _ = lb.sub_borrow(jnp.broadcast_to(jnp.asarray(F.p), y.shape), y)
    return lb.cselect(lb.is_zero(y), y, d)


def _compact(ck, cx, cy, cz, S):
    """Drop non-real entries (key <= 0), keep order, pad to static size S."""
    L = cx.shape[0]
    n = ck.shape[0]
    real = ck > 0
    pos = jnp.cumsum(real.astype(jnp.int32)) - 1
    pos = jnp.where(real, pos, S)
    nk = jnp.zeros((S,), jnp.int32).at[pos].set(ck, mode="drop")
    nx = jnp.zeros((L, S), jnp.uint32).at[:, pos].set(cx, mode="drop")
    ny = jnp.zeros((L, S), jnp.uint32).at[:, pos].set(cy, mode="drop")
    nz = jnp.zeros((L, S), jnp.uint32).at[:, pos].set(cz, mode="drop")
    return nk, nx, ny, nz, S


def msm_tpu_jit(group, block: int = 512):
    return jax.jit(functools.partial(msm_tpu, group, block=block),
                   static_argnames=("c", "scalar_bits"))
