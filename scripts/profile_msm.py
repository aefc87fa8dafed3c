"""Stage-level profiling of the TPU MSM pipeline (scratch tool)."""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops import limbs as lb
from constantine_tpu.ops.msm import _signed_digits
from constantine_tpu.ops.msm_tpu import (_cdiv, _rup, _neg_std, _pack16,
                                         _compact_gather, _lane_tree_sum,
                                         best_window_tpu)
from constantine_tpu.ops.pallas_ec import get_pallas_ec


def timeit(name, f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = f(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name:28s} {min(ts)*1e3:9.2f} ms", flush=True)
    return out


def main():
    n = int(os.environ.get("N", 65536))
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    L = F.L
    rng = np.random.default_rng(42)

    px = jnp.asarray(ctx.fp.encode([int(v) for v in rng.integers(1, 2**60, size=256)]))
    px = jnp.tile(px, (n // 256, 1))
    py = jnp.asarray(ctx.fp.encode([int(v) for v in rng.integers(1, 2**60, size=256)]))
    py = jnp.tile(py, (n // 256, 1))
    scal = rng.integers(0, 2**16, size=(n, 16), dtype=np.uint32)
    scalars = jnp.asarray(scal)

    bits = 255
    c = best_window_tpu(n, bits)
    W = _cdiv(bits + 1, c)
    H = 1 << (c - 1)
    block = 512
    pec = get_pallas_ec(F, block)
    flat = W * n
    K0 = max(8, _cdiv(n, 64))
    M = _rup(_cdiv(flat, K0), block)
    K = _cdiv(flat, M)
    pad = M * K - flat
    nb = W * (H + 1)
    K2 = 32
    r = _cdiv(n, K) + 1
    S = min(M * (K + 1), M + nb)
    print(f"N={n} c={c} W={W} H={H} flat={flat} K={K} M={M} pad={pad} "
          f"r={r} S={S}", flush=True)

    @jax.jit
    def stage_digits(scalars):
        digits = _signed_digits(scalars, c, W)
        widx = jax.lax.broadcasted_iota(jnp.int32, (W, n), 0)
        keys = jnp.where(digits == 0, 0,
                         widx * (H + 1) + jnp.abs(digits)).reshape(-1)
        neg = (digits < 0).reshape(-1)
        return keys, neg

    keys, neg = timeit("digits+keys", stage_digits, scalars)

    if pad:
        keys = jnp.concatenate([keys, jnp.zeros((pad,), keys.dtype)])
        neg = jnp.concatenate([neg, jnp.zeros((pad,), neg.dtype)])
    order = timeit("argsort", jax.jit(jnp.argsort), keys)

    Lh = L // 2

    @jax.jit
    def stage_gather(order, keys, neg, px, py):
        sk = keys[order]
        pidx = order % n
        sneg = neg[order]
        pxp = _pack16(px)
        ytab = jnp.concatenate([_pack16(py), _pack16(_neg_std(F, py))], 0)
        gx = jnp.take(pxp, pidx, axis=0)
        gy = jnp.take(ytab, pidx + sneg.astype(jnp.int32) * n, axis=0)
        sxT = gx.reshape(M, K, Lh).transpose(1, 2, 0)
        syT = gy.reshape(M, K, Lh).transpose(1, 2, 0)
        skT = sk.reshape(M, K).T
        return skT, sxT, syT

    skT, sxT, syT = timeit("gather+transpose (packed)", stage_gather,
                           order, keys, neg, px, py)

    flush = jax.jit(functools.partial(pec.flush_scan, packed=True))
    ekeys, ex, ey, ez = timeit("flush_scan", flush, skT, sxT, syT)

    cg = jax.jit(functools.partial(_compact_gather, S=S))
    ck, (cx, cy, cz) = timeit("compact+gather", cg, ekeys, [ex, ey, ez])

    def merge_round(ck, cx, cy, cz):
        M2 = _rup(_cdiv(S, K2), 128)
        pad2 = M2 * K2 - S
        if pad2:
            ck = jnp.concatenate([ck, jnp.zeros((pad2,), ck.dtype)])
            cx = jnp.pad(cx, ((0, 0), (0, pad2)))
            cy = jnp.pad(cy, ((0, 0), (0, pad2)))
            cz = jnp.pad(cz, ((0, 0), (0, pad2)))
        kT = ck.reshape(M2, K2).T
        xT = cx.reshape(L, M2, K2).transpose(2, 0, 1)
        yT = cy.reshape(L, M2, K2).transpose(2, 0, 1)
        zT = cz.reshape(L, M2, K2).transpose(2, 0, 1)
        ekeys, ex, ey, ez = pec.merge_scan(kT, xT, yT, zT)
        S2 = min(M2 * (K2 + 1), M2 + nb)
        return _compact_gather(ekeys, [ex, ey, ez], S2)

    ck, (cx, cy, cz) = timeit("merge round (incl compact)",
                              jax.jit(merge_round), ck, cx, cy, cz)

    @jax.jit
    def tree(ck, cx, cy, cz):
        Sf = ck.shape[0]
        for s in (1, 2):
            prev_k = jnp.roll(ck, s)
            idx = jnp.arange(Sf, dtype=jnp.int32)
            same = (ck == prev_k) & (idx >= s) & (ck > 0)
            shX = jnp.roll(cx, s, axis=1)
            shY = jnp.roll(cy, s, axis=1)
            shZ = jnp.roll(cz, s, axis=1)
            shZ = jnp.where(same[None, :], shZ, jnp.zeros_like(shZ))
            aX, aY, aZ = pec.add((cx, cy, cz), (shX, shY, shZ))
            cx2 = jnp.where(same[None, :], aX, cx)
            cy2 = jnp.where(same[None, :], aY, cy)
            cz2 = jnp.where(same[None, :], aZ, cz)
            cx, cy, cz = cx2, cy2, cz2
        return cx, cy, cz

    timeit("tree rounds (2x add)", tree, ck, cx, cy, cz)

    T = 1 << max(2, (c - 1) // 2)
    C = _cdiv(H, T)
    bx = jnp.zeros((T, L, W * C), jnp.uint32)

    @jax.jit
    def bred(bx, by, bz):
        return pec.bucket_reduce(bx, by, bz, T)

    timeit("bucket_reduce lvl1", bred, bx, bx, bx)

    @jax.jit
    def combine(wsum):
        dws = pec.scaled_doubles(wsum, c, W)
        return _lane_tree_sum(pec, dws, W)

    wsum = (jnp.zeros((L, W), jnp.uint32),) * 3
    timeit("window combine (ladder)", combine, wsum)


if __name__ == "__main__":
    main()
