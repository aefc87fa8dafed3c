"""Stage-by-stage MSM profile on the real chip, GLV (default-path) config.

Replicates the full default msm() pipeline: GLV decompose+apply -> digits
-> sort -> gather -> flush -> compact -> merge -> tail, each stage its own
jit, timed with a readback sync.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.msm import _signed_digits, _glv_for_group, _apply_glv
from constantine_tpu.ops.msm_tpu import (
    best_window_tpu, _cdiv, _rup, _pack16, _neg_std, _sorted_stream,
    _compact_mask_gather, _compact_boundaries, _merge_rounds, _msm_tail,
    msm_tpu)
from constantine_tpu.ops.pallas_ec import get_pallas_ec


def sync(o):
    leaves = jax.tree_util.tree_leaves(o)
    return np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def t(name, f, *args, reps=3, pipeline=4):
    out = f(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(pipeline):
            out = f(*args)
        sync(out)
        ts.append((time.time() - t0) / pipeline)
    print(f"{name:32s} {min(ts)*1e3:8.2f} ms", flush=True)
    return out


def main():
    N = int(os.environ.get("N", 65536))
    ctx = get_curve("BLS12_381")
    group = ctx.g1
    F = group.F
    L = F.L
    rng = np.random.default_rng(42)
    print("devices:", jax.devices())

    ks = jnp.asarray(ctx.scalars_to_limbs(
        [int(v) for v in rng.integers(1, 2**62, size=N)]))
    G = group.from_affine(tuple(
        jnp.broadcast_to(g, (N,) + g.shape[1:]) for g in ctx.g1_gen))
    t0 = time.time()
    pts = group.scalar_mul(ks, G, scalar_bits=64)
    (px, py), _ = group.to_affine(pts)
    sync(px)
    print(f"point generation: {time.time()-t0:.1f}s")

    sc = [int.from_bytes(rng.bytes(32), "big") % ctx.r for _ in range(N)]
    scalars = jnp.asarray(ctx.scalars_to_limbs(sc))

    glv_ctx = _glv_for_group(group.name)

    glvj = jax.jit(lambda p, s: _apply_glv(group, glv_ctx, p, s)[:2])
    (px2, py2), ks2 = t("glv decompose+apply", glvj, (px, py), scalars)
    bits = glv_ctx.mini_bits
    N2 = 2 * N

    c = int(os.environ.get("C", 0)) or best_window_tpu(N2, bits)
    W = _cdiv(bits + 1, c)
    H = 1 << (c - 1)
    block = 512
    pec = get_pallas_ec(F, block)
    flat = W * N2
    K0 = max(8, _cdiv(N2, 64))
    M = _rup(_cdiv(flat, K0), block)
    K = _rup(_cdiv(flat, M), 8)
    nb = W * (H + 1)
    print(f"bits={bits} c={c} W={W} flat={flat} K={K} M={M} nb={nb}")

    dig = t("digits", jax.jit(lambda s: _signed_digits(s, c, W)), ks2)
    sk, gi = t("sorted_stream",
               jax.jit(lambda d: _sorted_stream(d, c, W, H, N2)), dig)

    @jax.jit
    def mktab(px, py):
        pxp = _pack16(px)
        return jnp.concatenate([
            jnp.concatenate([pxp, _pack16(py)], axis=1),
            jnp.concatenate([pxp, _pack16(_neg_std(F, py))], axis=1)],
            axis=0)
    ptab = t("build table (2N, L)", mktab, px2, py2)

    pad = M * K - flat

    @jax.jit
    def gath(tb, gi, sk):
        if pad:
            sk2 = jnp.concatenate(
                [sk, jnp.full((pad,), nb + 1, sk.dtype)])
            gi2 = jnp.concatenate([gi, jnp.zeros((pad,), gi.dtype)])
        else:
            sk2, gi2 = sk, gi
        skT = sk2.reshape(M, K).T
        g = jnp.take(tb, gi2, axis=0)
        st = g.reshape(M, K, L).transpose(1, 2, 0)
        return sk2, skT, st
    skf, skT, st = t("gather+transpose (K,L,M)", gath, ptab, gi, sk)

    flush = jax.jit(lambda k, x: pec.flush_scan(k, x, None, packed=True))
    ex, ey, ez = t("flush_scan", flush, skT, st)

    K2 = 32
    compb = jax.jit(lambda skv, kv, x, y, z: _compact_boundaries(
        pec, skv, kv, (x, y, z), K, M, nb, H, K2)[:4])
    kT, xT, yT, zT = t("compact_boundaries", compb, skf, skT, ex, ey, ez)

    merge = jax.jit(pec.merge_scan)
    e2 = t("merge_scan", merge, kT, xT, yT, zT)

    M2 = _compact_boundaries(pec, skf, skT, (ex, ey, ez), K, M, nb, H, K2)[4] \
        if False else kT.shape[1]
    r = _cdiv(_cdiv(N2, K) + 1, K2) + 1

    mrg = jax.jit(lambda kTv, x, y, z: _merge_rounds(
        pec, kTv, x, y, z, K2, M2, nb, H, r, K2))
    ck, cx, cy, cz = t("merge_rounds(tail merges)", mrg, kT, *e2)

    tail = jax.jit(lambda a, b, c_, d: _msm_tail(
        group, pec, a, b, c_, d, c, W, H, nb, True))
    t("msm_tail (tree+reduce+combine)", tail, ck, cx, cy, cz)

    def full(pxa, pya, s):
        from constantine_tpu.ops.msm import msm
        return msm(group, (pxa, pya), s, scalar_bits=255)
    fullj = jax.jit(full)
    t("FULL msm (default path)", fullj, px, py, scalars, reps=3, pipeline=4)


if __name__ == "__main__":
    main()
