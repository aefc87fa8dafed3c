"""Reliable sequential stage benchmark (run ALONE on a quiet box).

Methodology: one process, one measurement at a time, outputs forced through
jax.lax.optimization_barrier so the algebraic simplifier cannot elide work
(sum-of-sort == sum etc.), then reduced to a scalar to minimize D2H.
Plausibility-check every number against HBM bandwidth (~819 GB/s on v5e).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.msm_tpu import _pack16, _neg_std, _cdiv, _rup
from constantine_tpu.ops.msm import _signed_digits
from constantine_tpu.ops.pallas_ec import get_pallas_ec


def force(*xs):
    xs = jax.lax.optimization_barrier(xs)
    return sum(jnp.sum(x.astype(jnp.uint32)) for x in xs)


def timeit(name, f, *args, reps=3, inner=4):
    g = jax.jit(f)
    out = jax.block_until_ready(g(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = g(*args)
        jax.block_until_ready(out)
        ts.append((time.time() - t0) / inner)
    print(f"{name:46s} {min(ts)*1e3:9.3f} ms", flush=True)
    return min(ts)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    N = 65536
    W, H = 22, 2048
    FLAT = W * N
    L, Lh = 24, 12
    block = 512
    K0 = max(8, _cdiv(N, 64))
    M = _rup(_cdiv(FLAT, K0), block)
    K = _cdiv(FLAT, M)
    pad = M * K - FLAT
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    pec = get_pallas_ec(F, block)

    big = jnp.asarray(rng.integers(0, 2**32, size=(M * K, Lh),
                                   dtype=np.uint32))
    keys = jnp.asarray(
        np.concatenate([rng.integers(0, W * (H + 1), size=FLAT),
                        np.zeros(pad)]).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, N, size=M * K, dtype=np.int32))
    rows = jnp.asarray(rng.integers(0, 2**32, size=(N, Lh), dtype=np.uint32))

    timeit("copy 69MB", lambda x: force(x + jnp.uint32(1)), big)
    timeit("sort u32 1.44M", lambda k: force(jnp.sort(k)), keys)
    timeit("argsort 1.44M", lambda k: force(jnp.argsort(k)), keys)
    timeit("sort composite (k<<16|i)",
           lambda k: force(jnp.sort(
               (k.astype(jnp.uint32) << jnp.uint32(16))
               | (jax.lax.broadcasted_iota(jnp.uint32, k.shape, 0)
                  & jnp.uint32(0xFFFF)))), keys)
    timeit("row-gather (N,12) x 1.44M",
           lambda r, i: force(jnp.take(r, i, axis=0)), rows, idx)
    timeit("lane-gather (12,N) x 1.44M",
           lambda r, i: force(jnp.take(r.T, i, axis=1)), rows, idx)
    timeit("3D transpose (M,K,12)->(K,12,M)",
           lambda x: force(x.reshape(M, K, Lh).transpose(1, 2, 0)), big)
    timeit("2D transpose (M,K)",
           lambda x: force(x.reshape(M, K).T), keys[:M * K])
    timeit("cumsum 1.44M",
           lambda k: force(jnp.cumsum(k)), keys)

    S = 46614
    big3d = jnp.asarray(rng.integers(0, 2**32, size=(K + 1, Lh, M),
                                     dtype=np.uint32))
    k_i = jnp.asarray(rng.integers(0, K, size=S, dtype=np.int32))
    m_i = jnp.asarray(rng.integers(0, M, size=S, dtype=np.int32))
    timeit("fancy [k_i,:,m_i].T (compact style)",
           lambda b, k, m: force(b[k, :, m].T), big3d, k_i, m_i)
    bigLKM = jnp.asarray(rng.integers(0, 2**32, size=(Lh, (K + 1) * M),
                                      dtype=np.uint32))
    sidx = jnp.asarray(rng.integers(0, (K + 1) * M, size=S, dtype=np.int32))
    timeit("lane-gather (12,KM)[:,sidx] (compact alt)",
           lambda b, s: force(jnp.take(b, s, axis=1)), bigLKM, sidx)
    timeit("row-gather (KM,12)[sidx] (compact alt2)",
           lambda b, s: force(jnp.take(b, s, axis=0)),
           jnp.asarray(rng.integers(0, 2**32, size=((K + 1) * M, Lh),
                                    dtype=np.uint32)), sidx)

    # scatter styles at compaction size
    vals12 = jnp.asarray(rng.integers(0, 2**32, size=(M * K, Lh),
                                      dtype=np.uint32))
    pos = jnp.asarray(rng.permutation(M * K).astype(np.int32))
    timeit("row-scatter (MK,12)->(S,12) drop",
           lambda v, p: force(jnp.zeros((S, Lh), jnp.uint32)
                              .at[p].set(v, mode="drop")), vals12, pos)

    # montmul kernel
    aT = jnp.asarray(rng.integers(0, 2**16, size=(L, 1 << 18),
                                  dtype=np.uint32))
    bT = jnp.asarray(rng.integers(0, 2**16, size=(L, 1 << 18),
                                  dtype=np.uint32))
    dt = timeit("pallas montmul 2^18 lanes",
                lambda x, y: force(pec._elemwise(
                    "mulbench", 2, 1,
                    lambda kf, ins, d: (kf.mul(ins[0], ins[1]),),
                    1 << 18)(x, y, pec._consts)[0]), aT, bT)
    print(f"  -> {dt / (1 << 18) * 1e9:.2f} ns/lane-mul", flush=True)

    # madd kernel
    P = tuple(jnp.asarray(rng.integers(0, 2**16, size=(L, 1 << 18),
                                       dtype=np.uint32)) for _ in range(3))
    Q = tuple(jnp.asarray(rng.integers(0, 2**16, size=(L, 1 << 18),
                                       dtype=np.uint32)) for _ in range(2))
    dt = timeit("pallas madd 2^18 lanes",
                lambda *a: force(*pec.madd(a[:3], a[3:])), *P, *Q)
    print(f"  -> {dt / (1 << 18) * 1e9:.2f} ns/lane-madd", flush=True)

    # digits (new vectorized)
    sc = jnp.asarray(rng.integers(0, 2**16, size=(N, 16), dtype=np.uint32))
    timeit("signed digits (W=22)",
           lambda s: force(_signed_digits(s, 12, 22)), sc)


if __name__ == "__main__":
    main()
