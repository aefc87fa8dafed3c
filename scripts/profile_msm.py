"""Stage-by-stage MSM profile on the real chip.

Replicates msm_tpu's stages as separately-jitted functions and times each
with a readback sync (block_until_ready does NOT wait for device
completion on the axon tunnel backend — a 4-byte device_get does).
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.msm import _signed_digits
from constantine_tpu.ops.msm_tpu import (
    best_window_tpu, _cdiv, _rup, _pack16, _neg_std, _sorted_stream,
    _compact_mask_gather, msm_tpu)
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

    bits = 255
    c = int(os.environ.get("C", 0)) or best_window_tpu(N, bits)
    W = _cdiv(bits + 1, c)
    H = 1 << (c - 1)
    block = 512
    pec = get_pallas_ec(F, block)
    flat = W * N
    K0 = max(8, _cdiv(N, 64))
    M = _rup(_cdiv(flat, K0), block)
    K = _rup(_cdiv(flat, M), 8)
    print(f"c={c} W={W} flat={flat} K={K} M={M}")

    dig = t("digits", jax.jit(lambda s: _signed_digits(s, c, W)), scalars)
    sk, gi = t("sorted_stream",
               jax.jit(lambda d: _sorted_stream(d, c, W, H, N)), dig)

    @jax.jit
    def mktab(px, py):
        pxp = _pack16(px)
        return jnp.concatenate([
            jnp.concatenate([pxp, _pack16(py)], axis=1),
            jnp.concatenate([pxp, _pack16(_neg_std(F, py))], axis=1)],
            axis=0)
    ptab = t("build table (2N, L)", mktab, px, py)

    pad = M * K - flat

    nb = W * (H + 1)

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
    Sb = M + nb
    M2 = _rup(_cdiv(Sb, K2), 128)
    comp = jax.jit(lambda k, x, y, z: _compact_mask_gather(
        k, [x, y, z], None, nb, H, shape2=(K2, M2)))
    kT, (xT, yT, zT) = t("compact_mask_gather", comp, skT, ex, ey, ez)
    print(f"  Sb={Sb} M2={M2}")

    merge = jax.jit(pec.merge_scan)
    t("merge_scan", merge, kT, xT, yT, zT)

    def full(pxa, pya, s):
        return msm_tpu(group, (pxa, pya), s, scalar_bits=bits,
                       c=c if os.environ.get("C") else None)
    fullj = jax.jit(full)
    t("FULL msm_tpu", fullj, px, py, scalars, reps=3, pipeline=4)


if __name__ == "__main__":
    main()
