"""Multi-scalar multiplication (Pippenger) — TPU-native dense formulation.

Re-design of the reference's optimized MSM stack
(constantine/math/elliptic/ec_multi_scalar_mul.nim:256-459 msmImpl_vartime /
msmAffineImpl_vartime, ec_multi_scalar_mul_scheduler.nim:172-215 window-size
model, :301-618 collision-avoiding scheduler) for SPMD hardware:

* signed windowed digits (bucket ids 1..2^(c-1), negated points for negative
  digits) computed on device — the analogue of the reference's signed
  recoding (bigints.nim:834 getSignedWindowAt);
* bucket accumulation WITHOUT atomics or data-dependent control flow:
  per window, (bucket, point) pairs are sorted by bucket id, then reduced
  with a flush-scan: lanes sweep contiguous chunks of the sorted stream,
  accumulating runs of equal ids with one batched mixed-add per step and
  emitting partial sums at run boundaries; emitted partials (provably at most
  n_lanes + n_buckets of them) are compacted by a second small sort and
  merged with a log-depth segmented tree. This replaces the reference's
  CycloneMSM scheduler queues: collision freedom comes from sorting, not
  scheduling.
* bucket reduction sum_b b*B_b as a log-depth suffix scan (Hillis-Steele)
  instead of the reference's serial sweep (ec_multi_scalar_mul.nim:186);
* windows processed under lax.scan; final combine by c doublings per window.

All log-depth reductions run as lax.scan over rounds with masked dynamic
rolls so the traced graph holds a single EC-add body per reduction — compile
time stays flat as N grows.

Work: ~1 batched EC mixed-add per (point, window) — the same asymptotics as
the reference's serial-optimized path, fully lane-parallel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as lb


def best_window_size(n: int, bits: int = 255) -> int:
    """Window size model. The reference's bestBucketBitSize balances
    n+2^(c-1) bucket adds per window against (bits/c) windows
    (ec_multi_scalar_mul_scheduler.nim:172). On TPU the per-window fixed
    cost (sort + compaction) is higher, so we bias one size larger."""
    log2n = max(1, n).bit_length() - 1
    c = max(2, min(16, log2n - 3))
    return c


def _signed_digits(scalars, c: int, n_windows: int):
    """(N, Ls) canonical 16-bit limbs -> (W, N) int32 signed digits in
    [-2^(c-1), 2^(c-1)]. Bucket id = |digit|, sign separate.

    Fully vectorized over windows: raw c-bit windows are extracted for all
    W at once (static limb gathers + per-row shifts), and the signed-digit
    carry chain (carry_w = g_w | (p_w & carry_{w-1}) with g = raw > half,
    p = raw == half) is resolved with a log-depth Kogge-Stone scan instead
    of a W-step serial loop."""
    N, Ls = scalars.shape
    half = 1 << (c - 1)
    full = 1 << c
    sT = scalars.T.astype(jnp.uint32)                    # (Ls, N)
    bit0 = np.arange(n_windows) * c
    li = np.minimum(bit0 // 16, Ls - 1)
    sh = jnp.asarray((bit0 % 16).astype(np.uint32))[:, None]
    valid_lo = (bit0 // 16) < Ls
    lo = jnp.where(jnp.asarray(valid_lo)[:, None], sT[li], 0)
    li1 = np.minimum(bit0 // 16 + 1, Ls - 1)
    valid_hi = (bit0 // 16 + 1) < Ls
    hi = jnp.where(jnp.asarray(valid_hi)[:, None], sT[li1], 0)
    raw = jnp.where(sh > 0, (lo >> sh) | (hi << (16 - sh)), lo) \
        & np.uint32(full - 1)                            # (W, N)
    g = raw > half                                       # generates carry
    p = raw == half                                      # propagates carry
    carry = g
    s = 1
    while s < n_windows:
        shifted = jnp.concatenate(
            [jnp.zeros((s, N), jnp.bool_), carry[:-s]], axis=0)
        pacc = jnp.concatenate(
            [jnp.zeros((s, N), jnp.bool_), p[:-s]], axis=0)
        carry = carry | (p & shifted)
        p = p & pacc
        s *= 2
    carry_in = jnp.concatenate(
        [jnp.zeros((1, N), jnp.bool_), carry[:-1]], axis=0)
    return (raw.astype(jnp.int32) + carry_in.astype(jnp.int32)
            - jnp.int32(full) * carry.astype(jnp.int32))


def _masked_roll(group, vals, s, up: bool):
    """vals (point tuple) rolled by s lanes along axis 0; vacated lanes get
    the group NEUTRAL element (s traced). Zero-fill would be wrong for
    groups whose neutral is not all-zero limbs: twisted Edwards neutral is
    (0,1,1) and its complete law has no infinity masking, so an all-zero
    point would absorb every sum. For Weierstrass-Jacobian any Z=0 point is
    infinity, making this equivalent to a zero fill there."""
    n = vals[0].shape[0]
    # batch shape for infinity: every leaf leads with the lane axis plus any
    # extra batch axes shared across leaves (leaf shapes already agree)
    extra = vals[0].shape[1:-1] if not hasattr(group.F, "deg") \
        else vals[0].shape[1:-2]
    neutral = group.infinity((n,) + extra)
    out = []
    for v, nv in zip(vals, neutral):
        rolled = jnp.roll(v, -s if up else s, axis=0)
        idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        mask = (idx >= n - s) if up else (idx < s)
        out.append(jnp.where(mask, nv, rolled))
    return tuple(out)


def _log_rounds(n: int):
    r = max(1, (n - 1)).bit_length()
    return jnp.asarray(np.power(2, np.arange(r), dtype=np.int32))


def _segmented_sum(group, keys, vals, n: int):
    """Inclusive segmented EC scan over sorted keys: vals[i] accumulates all
    earlier entries with the same key. Log-depth, single add in the trace."""
    def rnd(state, s):
        vv = state
        same = keys == jnp.roll(keys, s, axis=0)
        idx = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 0)
        same = same & (idx >= s)
        shifted = _masked_roll(group, vv, s, up=False)
        summed = group.add(vv, shifted)
        return group.select(same, summed, vv), None

    vals, _ = jax.lax.scan(rnd, vals, _log_rounds(n))
    return vals


def _suffix_sum(group, vals, n: int):
    """vals[j] <- sum_{b >= j} vals[b], log-depth."""
    def rnd(state, s):
        shifted = _masked_roll(group, state, s, up=True)
        return group.add(state, shifted), None
    vals, _ = jax.lax.scan(rnd, vals, _log_rounds(n))
    return vals


def _sum_all(group, vals, n: int):
    """Total EC sum of a (n, ...) stack, log-depth; returns batchless point."""
    vals = _suffix_sum(group, vals, n)
    return tuple(v[0] for v in vals)


@functools.lru_cache(maxsize=None)
def _glv_for_group(group_name: str):
    """GLV context for an ECGroup named '<curve>.G1', or None.

    The reference applies the endomorphism split unconditionally for curves
    that have one (ec_multi_scalar_mul.nim:459 withEndo); mirroring that,
    the split is the DEFAULT here — halved window count halves the
    bucket-side work (compaction, merge, bucket reduction, window combine)
    while the flush-madd count stays constant."""
    if not group_name.endswith(".G1"):
        return None
    try:
        from .glv import get_glv
        return get_glv(group_name[: -len(".G1")])
    except Exception:
        return None


def _apply_glv(group, glv_ctx, points_aff, scalars):
    """applyEndomorphism analogue (ec_multi_scalar_mul.nim:398-434):
    N points x b-bit scalars -> 2N points x (b/2)-bit scalars."""
    k1, n1, k2, n2 = glv_ctx.decompose(scalars)
    px, py = points_aff
    ex, ey = glv_ctx.endo((px, py))
    P1 = group.aff_cneg(n1, (px, py))
    P2 = group.aff_cneg(n2, (ex, ey))
    pts = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(P1, P2))
    ks = jnp.concatenate([k1, k2], axis=0)
    return pts, ks, glv_ctx.mini_bits


def msm(group, points_aff, scalars, c: int = None, scalar_bits: int = None,
        chunk: int = None, max_flat: int = 1 << 22, use_pallas: bool = None,
        digits=None, glv: bool = None):
    """MSM: sum_i scalars[i] * P_i. Returns a Jacobian point (batch ()).

    group: ops.ec.ECGroup (G1 over Fp or G2 over Fp2)
    points_aff: (x, y) arrays with leading batch N
    scalars: (N, Ls) canonical 16-bit limbs
    Public API analogue: multiScalarMul_vartime
    (ec_multi_scalar_mul.nim:525) — here 'vartime' is moot: the schedule is
    input-independent (fully dense), so this is also constant-time.

    All windows are processed TOGETHER: (window, bucket) pairs are flattened
    into one global key stream so the sort and the flush-scan run at full
    lane width (the TPU analogue of the reference's window-level
    parallelism, ec_multi_scalar_mul_parallel.nim:246). `max_flat` bounds
    the flattened stream (memory); larger inputs process window groups
    sequentially under lax.scan.
    """
    import os
    F = group.F
    pts = tuple(points_aff) if isinstance(points_aff, (tuple, list)) \
        else (points_aff,)
    # GLV endomorphism pre-split (default on, CTT_MSM_GLV=0 disables)
    if glv is None:
        glv = digits is None and os.environ.get("CTT_MSM_GLV", "1") != "0"
    if glv and digits is None and scalars is not None:
        glv_ctx = _glv_for_group(group.name)
        if glv_ctx is not None:
            pts, scalars, scalar_bits = _apply_glv(group, glv_ctx, pts,
                                                   scalars)
    N = pts[0].shape[0] if scalars is None else scalars.shape[0]
    # Fused Pallas kernel path: G1 (base field, a=0) on an accelerator
    # backend. Tower fields (G2) and CPU runs keep the XLA formulation.
    if use_pallas is None:
        use_pallas = (jax.default_backend() != "cpu"
                      or os.environ.get("CTT_MSM_PALLAS") == "1") \
            and not hasattr(F, "deg") and group.a_int == 0
    if use_pallas:
        from .msm_tpu import msm_tpu
        return msm_tpu(group, pts, scalars, c=c, scalar_bits=scalar_bits,
                       digits=digits)
    if digits is not None:
        # precomputed signed digits (W, N) — fixed-base path (msm_precomp)
        assert c is not None
        W = digits.shape[0]
        half = 1 << (c - 1)
    else:
        bits = scalar_bits or scalars.shape[1] * 16
        if c is None:
            c = best_window_size(N, bits)
        W = -(-bits // c) + 1  # +1 for signed-digit carry overflow
        half = 1 << (c - 1)
        digits = _signed_digits(scalars, c, W)      # (W, N) int32

    # group windows so each flattened stream is <= max_flat entries
    wg = max(1, min(W, max_flat // max(N, 1)))
    n_groups = -(-W // wg)
    wpad = n_groups * wg - W
    if wpad:
        digits = jnp.concatenate(
            [digits, jnp.zeros((wpad, N), digits.dtype)], axis=0)
    digits = digits.reshape(n_groups, wg, N)

    flat = wg * N
    # lane layout for the flush-scan: K sequential steps, M = flat/K lanes
    if chunk is None:
        chunk = int(np.clip(flat // (1 << 16), 8, 64))
    K = min(chunk, flat)
    M = -(-flat // K)
    pad = M * K - flat

    big = jnp.int32(2**31 - 1)
    nbuckets = wg * (half + 1)
    emax = int(min(M + wg * (half + 2), (K + 1) * M))

    def one_group(carry, dws):
        # dws: (wg, N) signed digits for this window group
        keys = jnp.abs(dws)                          # 0..half
        zero = keys == 0
        # global key: w*(half+1) + |d|, zeros sent to key 0 (ignored)
        widx = jax.lax.broadcasted_iota(jnp.int32, (wg, N), 0)
        gkeys = jnp.where(zero, 0, widx * (half + 1) + keys).reshape(-1)
        neg = (dws < 0).reshape(-1)
        order = jnp.argsort(gkeys)
        sk = gkeys[order]
        pidx = order % N                             # original point index
        spts = tuple(jnp.take(t, pidx, axis=0) for t in pts)
        sneg = neg[order]
        spts = group.aff_cneg(sneg, spts)
        if pad:
            sk = jnp.concatenate([sk, jnp.zeros((pad,), sk.dtype)])
            spts = tuple(
                jnp.concatenate([t, F.broadcast_zero((pad,))], axis=0)
                for t in spts)
        # lane-major chunks: lane m sweeps sorted[m*K:(m+1)*K]
        skc = sk.reshape(M, K).swapaxes(0, 1)       # (K, M)
        cpts = tuple(_to_chunks(t, M, K) for t in spts)

        inf = group.infinity((M,))

        def flush_step(state, inp):
            acc, cur_key = state
            k, coords = inp[0], inp[1:]
            same = k == cur_key
            emit_key = jnp.where(same, -1, cur_key)
            emit = acc
            fresh = group.from_affine(coords)
            grown = group.madd(acc, coords)
            acc_new = group.select(same, grown, fresh)
            return (acc_new, k), (emit_key, emit)

        (acc_f, key_f), (ekeys, evals) = jax.lax.scan(
            flush_step, (inf, jnp.full((M,), -1, jnp.int32)),
            (skc,) + cpts)
        # append final lane accumulators as the (K+1)-th per-lane emission so
        # the lane-major flatten stays globally key-sorted (lane m's final
        # run flushes BEFORE lane m+1's entries)
        ekeys = jnp.concatenate([ekeys, key_f[None]], axis=0)   # (K+1, M)
        evals = tuple(jnp.concatenate([e, f[None]], axis=0)
                      for e, f in zip(evals, acc_f))
        ekeys = ekeys.swapaxes(0, 1).reshape(-1)
        evals = tuple(_flatten_chunks(e) for e in evals)

        # compact: <= M + wg*(half+1) real emissions exist, and they appear
        # in key-sorted stream order already — a cumsum compaction scatter
        # replaces a second large sort.
        real = ekeys > 0
        pos = jnp.cumsum(real.astype(jnp.int32)) - 1
        pos = jnp.where(real, pos, emax)               # trash -> dropped
        ck = jnp.full((emax,), big, jnp.int32).at[pos].set(
            jnp.where(real, ekeys, big), mode="drop")
        cv = tuple(
            jnp.zeros((emax,) + v.shape[1:], v.dtype).at[pos].set(
                v, mode="drop")
            for v in evals)

        cv = _segmented_sum(group, ck, cv, emax)
        # last element of each key-run holds the bucket sum
        last = jnp.concatenate([ck[:-1] != ck[1:], jnp.ones((1,), jnp.bool_)])
        valid = last & (ck != big)
        tgt = jnp.where(valid, ck, 0)

        buckets = group.infinity((nbuckets,))
        buckets = tuple(
            b.at[tgt].set(jnp.where(_expand(valid, v.ndim - 1), v, b[tgt]))
            for b, v in zip(buckets, cv))
        # (wg, half+1): move bucket axis first for the suffix scan,
        # windows ride along as batch
        buckets = tuple(
            b.reshape((wg, half + 1) + b.shape[1:]).swapaxes(0, 1)
            for b in buckets)
        buckets = _suffix_sum(group, buckets, half + 1)
        # window sums = sum_{j>=1} suffix[j] per window
        wsum = _suffix_sum(group, tuple(b[1:] for b in buckets), half)
        return carry, tuple(w[0] for w in wsum)     # (wg, ...point)

    _, wsums = jax.lax.scan(one_group, 0, digits)   # leaves (n_groups, wg, .)
    wsums = tuple(w.reshape((n_groups * wg,) + w.shape[2:])[:W]
                  for w in wsums)

    # combine windows, top first: total = ((top*2^c + w_{t-1})*2^c + ...)
    def combine(total, idx):
        def dbl(_, t):
            return group.double(t)
        total = jax.lax.fori_loop(0, c, dbl, total)
        total = group.add(total, tuple(w[idx] for w in wsums))
        return total, None

    total = tuple(w[W - 1] for w in wsums)
    idxs = jnp.arange(W - 2, -1, -1, dtype=jnp.int32)
    total, _ = jax.lax.scan(combine, total, idxs)
    return total


def _expand(mask, extra_axes):
    for _ in range(extra_axes):
        mask = mask[..., None]
    return mask


def _to_chunks(arr, M, K):
    """(M*K, ...elem) -> (K, M, ...elem), lane m owning arr[m*K:(m+1)*K]."""
    shape = arr.shape[1:]
    return arr.reshape((M, K) + shape).swapaxes(0, 1)


def _flatten_chunks(arr):
    """(K, M, ...) -> (M*K, ...) restoring the sorted stream order."""
    K, M = arr.shape[:2]
    return arr.swapaxes(0, 1).reshape((M * K,) + arr.shape[2:])


def msm_jit(group):
    """Returns a jitted msm closed over the group (static c/bits/chunk)."""
    return jax.jit(functools.partial(msm, group),
                   static_argnames=("c", "scalar_bits", "chunk"))
