"""Measure the MSM stream-gather vs transpose split and relayout options."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    print(f"{name:44s} {min(ts)*1e3:8.2f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    N2 = 262144                    # post-GLV table rows (x||y packed)
    L = 24
    M, K = 1024, 1280              # c=14 geometry
    flat = M * K
    ptab = jnp.asarray(
        rng.integers(0, 2**32, size=(2 * N2, L), dtype=np.uint32))
    gi = jnp.asarray(
        rng.integers(0, 2 * N2, size=(flat,), dtype=np.int32))

    t("gather only (flat, L)",
      jax.jit(lambda tb, g: jnp.take(tb, g, axis=0)), ptab, gi)

    @jax.jit
    def gt1(tb, g):
        x = jnp.take(tb, g, axis=0)
        return x.reshape(M, K, L).transpose(1, 2, 0)
    t("gather + (M,K,L)->(K,L,M) transpose", gt1, ptab, gi)

    # stream-order-transposed index array: take gives (K, M, L) directly
    gi_t = jnp.asarray(np.asarray(jax.device_get(gi)).reshape(M, K).T.copy()
                       .reshape(-1))

    @jax.jit
    def gt2(tb, g):
        x = jnp.take(tb, g, axis=0)
        return x.reshape(K, M, L).transpose(0, 2, 1)
    t("gather(k-major) + inner (M,L)->(L,M)", gt2, ptab, gi_t)

    # gather from a transposed table: rows = limbs? (per-limb gather along
    # lanes) — expected slow, for reference
    @jax.jit
    def gt3(tb, g):
        x = jnp.take(tb, g, axis=0)
        return x.reshape(K, M, L)
    t("gather(k-major), no transpose", gt3, ptab, gi_t)

    # Does a pure XLA transpose of the already-gathered array dominate?
    g0 = jnp.take(ptab, gi, axis=0)
    sync(g0)
    t("(M,K,L)->(K,L,M) transpose only",
      jax.jit(lambda x: x.reshape(M, K, L).transpose(1, 2, 0)), g0)
    t("(K,M,L)->(K,L,M) transpose only",
      jax.jit(lambda x: x.reshape(K, M, L).transpose(0, 2, 1)), g0)


if __name__ == "__main__":
    main()
