"""Microbenchmark: data-movement primitives for the MSM pipeline on TPU.

Determines which gather/transpose/sort formulations are fast so the MSM
glue (measured ~60ms of the 137ms) can be redesigned on facts.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(name, f, *args, reps=3, inner=4):
    out = jax.block_until_ready(jax.jit(f)(*args))
    g = jax.jit(f)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = g(*args)
        jax.block_until_ready(out)
        ts.append((time.time() - t0) / inner)
    print(f"{name:44s} {min(ts)*1e3:9.3f} ms")


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    N = 65536
    FLAT = 1441792          # 22 * N
    L = 24
    Lh = 12
    M, K = 1536, 939

    rows = jnp.asarray(rng.integers(0, 2**32, size=(N, Lh), dtype=np.uint32))
    planar = jnp.asarray(rng.integers(0, 2**32, size=(Lh, N), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, N, size=FLAT, dtype=np.int32))
    keys32 = jnp.asarray(rng.integers(0, 2**31, size=FLAT, dtype=np.int32))
    kmk = jnp.asarray(rng.integers(0, 2**31, size=(M, K), dtype=np.int32))
    big3d = jnp.asarray(
        rng.integers(0, 2**32, size=(K, Lh, M), dtype=np.uint32))
    bigLKM = jnp.asarray(
        rng.integers(0, 2**32, size=(Lh, K, M), dtype=np.uint32))
    S = 46614
    sidx = jnp.asarray(rng.integers(0, K * M, size=S, dtype=np.int32))
    k_i = sidx // M
    m_i = sidx % M

    # gathers
    timeit("row-gather (N,12)[idx] -> (FLAT,12)",
           lambda r, i: jnp.take(r, i, axis=0), rows, idx)
    timeit("lane-gather (12,N)[:,idx] -> (12,FLAT)",
           lambda p, i: jnp.take(p, i, axis=1), planar, idx)
    timeit("onehot... skip", lambda x: x + 1, jnp.zeros((8,)))

    # transposes
    timeit("3D transpose (M,K,12)->(K,12,M)",
           lambda x: x.reshape(M, K, Lh).transpose(1, 2, 0),
           jnp.asarray(rng.integers(0, 2**32, size=(M * K, Lh),
                                    dtype=np.uint32)))
    timeit("2D transpose (M,K)->(K,M) int32",
           lambda x: x.T.copy() if hasattr(x.T, 'copy') else x.T, kmk)
    timeit("major permute (12,K,M)->(K,12,M)",
           lambda x: x.transpose(1, 0, 2), bigLKM)
    timeit("row-gather then reshape-only (FLAT,12)",
           lambda r, i: jnp.take(r, i, axis=0).reshape(M, K, Lh), rows, idx)

    # compaction gather styles from (K,Lh,M)
    timeit("fancy [k_i,:,m_i] from (K,12,M)",
           lambda b, k, m: b[k, :, m], big3d, k_i, m_i)
    timeit("lane-gather from (12,K*M) by flat idx",
           lambda b, s: jnp.take(b.reshape(Lh, K * M), s, axis=1),
           bigLKM, sidx)

    # scatter styles
    pos = jnp.asarray(np.sort(rng.choice(K * M, size=S, replace=False))
                      .astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 2**32, size=(Lh, S), dtype=np.uint32))
    timeit("lane-scatter (12,S)->(12,K*M)",
           lambda v, p: jnp.zeros((Lh, K * M), jnp.uint32)
           .at[:, p].set(v, mode="drop"), vals, pos)

    # sorts
    timeit("jnp.sort u32 FLAT", lambda k: jnp.sort(k), keys32)
    timeit("jnp.argsort i32 FLAT", lambda k: jnp.argsort(k), keys32)
    k16 = jnp.asarray(rng.integers(0, 2**15, size=(22, N), dtype=np.int32))
    timeit("batched sort (22,N) rows", lambda k: jnp.sort(k, axis=1), k16)

    # scans
    timeit("cumsum i32 FLAT", lambda k: jnp.cumsum(k), keys32)
    timeit("assoc-scan max i32 FLAT",
           lambda k: jax.lax.associative_scan(jnp.maximum, k), keys32)


if __name__ == "__main__":
    main()
