"""Stage-by-stage MSM profile on the real chip.

Replicates msm_tpu's stages as separately-jitted functions and times each
with block_until_ready, to find where the 134 ms goes.
"""
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
from constantine_tpu.ops.msm_tpu import (
    best_window_tpu, _cdiv, _rup, _pack16, _neg_std, _compact_gather)
from constantine_tpu.ops.pallas_ec import get_pallas_ec


def t(name, f, *args, reps=3, pipeline=4):
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(pipeline):
            out = f(*args)
        jax.block_until_ready(out)
        ts.append((time.time() - t0) / pipeline)
    print(f"{name:30s} {min(ts)*1e3:8.2f} ms")
    return out


def main():
    N = 65536
    ctx = get_curve("BLS12_381")
    group = ctx.g1
    F = group.F
    L = F.L
    rng = np.random.default_rng(42)
    print("devices:", jax.devices())

    # fake but valid-shaped points: use the generator broadcast (values
    # irrelevant for timing; same op counts since the law is branch-free
    # except @pl.when doubling which we want OFF -> use distinct points:
    # generate k*G quickly for k in 1..N via scalar_mul on device
    ks = jnp.asarray(ctx.scalars_to_limbs(
        [int(v) for v in rng.integers(1, 2**62, size=N)]))
    G = group.from_affine(tuple(
        jnp.broadcast_to(g, (N,) + g.shape[1:]) for g in ctx.g1_gen))
    t0 = time.time()
    pts = group.scalar_mul(ks, G, scalar_bits=64)
    (px, py), _ = group.to_affine(pts)
    px.block_until_ready()
    print(f"point generation: {time.time()-t0:.1f}s")

    hi = rng.integers(0, 2**64, size=(N, 3), dtype=np.uint64)
    full = [int(a) | (int(b[0]) << 64) | (int(b[1]) << 128) | (int(b[2]) << 192)
            for a, b in zip(rng.integers(0, 2**64, size=N, dtype=np.uint64), hi)]
    scalars = jnp.asarray(ctx.scalars_to_limbs([v % ctx.r for v in full]))

    bits = 255
    c = best_window_tpu(N, bits)
    W = _cdiv(bits + 1, c)
    H = 1 << (c - 1)
    print(f"c={c} W={W} H={H} flat={W*N}")

    block = 512
    pec = get_pallas_ec(F, block)

    # stage 1: digits
    dig = t("digits", jax.jit(lambda s: _signed_digits(s, c, W)), scalars)

    # stage 2: keys + sort + gather
    @jax.jit
    def sort_gather(digits, px, py):
        widx = jax.lax.broadcasted_iota(jnp.int32, (W, N), 0)
        keys = jnp.where(digits == 0, 0,
                         widx * (H + 1) + jnp.abs(digits)).reshape(-1)
        neg = (digits < 0).reshape(-1)
        flat = W * N
        K0 = max(8, _cdiv(N, 64))
        M = _rup(_cdiv(flat, K0), block)
        K = _cdiv(flat, M)
        pad = M * K - flat
        if pad:
            keys = jnp.concatenate([keys, jnp.zeros((pad,), keys.dtype)])
            neg = jnp.concatenate([neg, jnp.zeros((pad,), neg.dtype)])
        order = jnp.argsort(keys)
        sk = keys[order]
        pidx = order % N
        sneg = neg[order]
        pxp = _pack16(px)
        ptab = jnp.concatenate([
            jnp.concatenate([pxp, _pack16(py)], axis=1),
            jnp.concatenate([pxp, _pack16(_neg_std(F, py))], axis=1)], 0)
        g = jnp.take(ptab, pidx + sneg.astype(jnp.int32) * N, axis=0)
        sT = g.reshape(M, K, L).transpose(1, 2, 0)
        skT = sk.reshape(M, K).T
        return skT, sT

    @jax.jit
    def sort_only(digits):
        widx = jax.lax.broadcasted_iota(jnp.int32, (W, N), 0)
        keys = jnp.where(digits == 0, 0,
                         widx * (H + 1) + jnp.abs(digits)).reshape(-1)
        return jnp.argsort(keys)

    t("argsort only", sort_only, dig)
    skT, sxT, syT = t("sort+gather+transpose", sort_gather, dig, px, py)
    K, _, M = sxT.shape
    print(f"  K={K} M={M}")

    # stage 3: flush scan
    flush = jax.jit(lambda k, x, y: pec.flush_scan(k, x, y, packed=True))
    ekeys, ex, ey, ez = t("flush_scan", flush, skT, sxT, syT)

    # stage 4: compaction
    nb = W * (H + 1)
    S = min(M * (K + 1), M + nb)
    comp = jax.jit(lambda ek, x, y, z: _compact_gather(ek, [x, y, z], S))
    ck, cvs = t("compact_gather", comp, ekeys, ex, ey, ez)
    print(f"  S={S}")

    # stage 5+: remainder (tree rounds + scatter + bucket reduce + combine)
    from constantine_tpu.ops.msm_tpu import msm_tpu

    def full(pxa, pya, s):
        return msm_tpu(group, (pxa, pya), s, scalar_bits=bits)
    fullj = jax.jit(full)
    t("FULL msm_tpu", fullj, px, py, scalars, reps=3, pipeline=4)


if __name__ == "__main__":
    main()
