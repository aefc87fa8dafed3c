"""Data-movement microbench v2 — forces materialization via checksum, and
bisects the real sort_gather stage of msm_tpu at true sizes."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.msm_tpu import _pack16, _neg_std, _cdiv, _rup


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


def cs(x):
    # checksum that forces every element: bitwise fold then sum
    return jnp.sum(x.astype(jnp.uint32) ^ jnp.uint32(0x9E3779B9))


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    N = 65536
    W, H = 22, 2048
    FLAT = W * N
    Lh = 12
    block = 512
    K0 = max(8, _cdiv(N, 64))
    M = _rup(_cdiv(FLAT, K0), block)
    K = _cdiv(FLAT, M)
    pad = M * K - FLAT

    rows = jnp.asarray(rng.integers(0, 2**32, size=(N, Lh), dtype=np.uint32))
    rows2N = jnp.asarray(
        rng.integers(0, 2**32, size=(2 * N, Lh), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, N, size=M * K, dtype=np.int32))
    keys = jnp.asarray(rng.integers(0, W * (H + 1),
                                    size=FLAT, dtype=np.int32))

    timeit("copy 69MB", lambda x: x + jnp.uint32(1),
           jnp.zeros((M * K, Lh), jnp.uint32))
    timeit("row-gather (N,12)[idx]->cs", lambda r, i: cs(jnp.take(r, i, 0)),
           rows, idx)
    timeit("row-gather (2N,12)[idx]->cs", lambda r, i: cs(jnp.take(r, i, 0)),
           rows2N, idx)
    timeit("lane-gather (12,N)[:,idx]->cs",
           lambda r, i: cs(jnp.take(r.T, i, 1)), rows, idx)
    big = jnp.asarray(rng.integers(0, 2**32, size=(M * K, Lh),
                                   dtype=np.uint32))
    timeit("3D transpose (M,K,12)->(K,12,M)->cs",
           lambda x: cs(x.reshape(M, K, Lh).transpose(1, 2, 0)), big)
    bigLKM = jnp.asarray(rng.integers(0, 2**32, size=(Lh, K, M),
                                      dtype=np.uint32))
    timeit("major permute (12,K,M)->(K,12,M)->cs",
           lambda x: cs(x.transpose(1, 0, 2)), bigLKM)
    timeit("2D transpose (M,K)->cs", lambda x: cs(x.T),
           jnp.asarray(rng.integers(0, 2**31, size=(M, K), dtype=np.int32)))
    timeit("sort u32 FLAT->cs", lambda k: cs(jnp.sort(k)), keys)
    timeit("argsort FLAT->cs", lambda k: cs(jnp.argsort(k)), keys)
    timeit("sort composite u32->cs",
           lambda k, i: cs(jnp.sort((k.astype(jnp.uint32) << 16)
                                    | (i & 0xFFFF).astype(jnp.uint32)[:FLAT])),
           keys, idx)
    timeit("cumsum i32 FLAT->cs", lambda k: cs(jnp.cumsum(k)), keys)

    # fancy compaction gather (real sizes)
    S = 46614
    big3d = jnp.asarray(rng.integers(0, 2**32, size=(K + 1, Lh, M),
                                     dtype=np.uint32))
    k_i = jnp.asarray(rng.integers(0, K, size=S, dtype=np.int32))
    m_i = jnp.asarray(rng.integers(0, M, size=S, dtype=np.int32))
    timeit("fancy [k_i,:,m_i] (K,12,M)->cs",
           lambda b, k, m: cs(b[k, :, m]), big3d, k_i, m_i)
    bigLKM2 = jnp.asarray(rng.integers(0, 2**32, size=(Lh, (K + 1) * M),
                                       dtype=np.uint32))
    sidx = jnp.asarray(rng.integers(0, (K + 1) * M, size=S, dtype=np.int32))
    timeit("lane-gather (12,KM)[:,sidx]->cs",
           lambda b, s: cs(jnp.take(b, s, axis=1)), bigLKM2, sidx)
    timeit("row-gather (KM,12)[sidx]->cs",
           lambda b, s: cs(jnp.take(b.reshape(Lh, -1).T, s, axis=0)),
           bigLKM2, sidx)

    # ---- bisect real sort_gather --------------------------------------------
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    px = jnp.asarray(rng.integers(0, 2**16, size=(N, 24), dtype=np.uint32))
    py = jnp.asarray(rng.integers(0, 2**16, size=(N, 24), dtype=np.uint32))
    keysp = jnp.concatenate([keys, jnp.zeros((pad,), jnp.int32)])
    neg = jnp.asarray(rng.integers(0, 2, size=M * K, dtype=np.int32)) == 1

    timeit("s0 argsort", lambda k: cs(jnp.argsort(k)), keysp)

    def s1(k, px_, py_):
        order = jnp.argsort(k)
        pidx = order % N
        return cs(jnp.take(_pack16(px_), pidx, axis=0))
    timeit("s1 argsort+1 gather", s1, keysp, px, py)

    def s2(k, px_, py_, ng):
        order = jnp.argsort(k)
        pidx = order % N
        sneg = ng[order]
        pxp = _pack16(px_)
        ytab = jnp.concatenate([_pack16(py_), _pack16(_neg_std(F, py_))], 0)
        gx = jnp.take(pxp, pidx, axis=0)
        gy = jnp.take(ytab, pidx + sneg.astype(jnp.int32) * N, axis=0)
        return cs(gx) + cs(gy)
    timeit("s2 +2nd gather+negtab", s2, keysp, px, py, neg)

    def s3(k, px_, py_, ng):
        order = jnp.argsort(k)
        pidx = order % N
        sneg = ng[order]
        pxp = _pack16(px_)
        ytab = jnp.concatenate([_pack16(py_), _pack16(_neg_std(F, py_))], 0)
        gx = jnp.take(pxp, pidx, axis=0)
        gy = jnp.take(ytab, pidx + sneg.astype(jnp.int32) * N, axis=0)
        sxT = gx.reshape(M, K, Lh).transpose(1, 2, 0)
        syT = gy.reshape(M, K, Lh).transpose(1, 2, 0)
        skT = k[order].reshape(M, K).T
        return cs(sxT) + cs(syT) + cs(skT)
    timeit("s3 full sort_gather", s3, keysp, px, py, neg)


if __name__ == "__main__":
    main()
