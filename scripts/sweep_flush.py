"""Sweep flush_scan geometry (block width, window size) on the real chip.

The flush kernel is the MSM's dominant stage (~60ms of ~105ms at N=2^16
GLV). If it is latency-bound on the CIOS dependency chain (each CIOS step
depends on the previous via t0 -> m), widening the block adds independent
elements per dependent op and should speed it up; if it is issue-bound,
wider blocks change nothing.
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
from constantine_tpu.ops.msm_tpu import (_cdiv, _rup, _pack16, _neg_std,
                                         _sorted_stream)
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
    print(f"{name:40s} {min(ts)*1e3:8.2f} ms", flush=True)
    return out


def main():
    N2 = int(os.environ.get("N2", 131072))   # post-GLV point count
    bits = int(os.environ.get("BITS", 130))
    ctx = get_curve("BLS12_381")
    F = ctx.g1.F
    L = F.L
    rng = np.random.default_rng(42)
    print("devices:", jax.devices())

    # synthetic affine points (random field elements — flush doesn't check
    # curve membership; timing only)
    px = jnp.asarray(
        rng.integers(0, 2**16, size=(N2, L), dtype=np.uint32))
    py = jnp.asarray(
        rng.integers(0, 2**16, size=(N2, L), dtype=np.uint32))
    sc = [int.from_bytes(rng.bytes(17), "big") % (1 << bits)
          for _ in range(N2)]
    Ls = _cdiv(bits, 16)
    scal = np.zeros((N2, Ls), np.uint32)
    for i, v in enumerate(sc):
        for j in range(Ls):
            scal[i, j] = (v >> (16 * j)) & 0xFFFF
    scal = jnp.asarray(scal)

    for c in [int(v) for v in os.environ.get("CS", "12,14").split(",")]:
        W = _cdiv(bits + 1, c)
        H = 1 << (c - 1)
        nb = W * (H + 1)
        digits = jax.jit(
            lambda s: _signed_digits(s, c, W))(scal)
        sk, gi = jax.jit(
            lambda d: _sorted_stream(d, c, W, H, N2))(digits)
        pxp = _pack16(px)
        ptab = jnp.concatenate([
            jnp.concatenate([pxp, _pack16(py)], axis=1),
            jnp.concatenate([pxp, _pack16(_neg_std(F, py))], axis=1)],
            axis=0)
        flat = W * N2
        for block in [int(v) for v in
                      os.environ.get("BLOCKS", "512,1024").split(",")]:
            for k0div in [int(v) for v in
                          os.environ.get("K0DIV", "64").split(",")]:
                pec = get_pallas_ec(F, block)
                K0 = max(8, _cdiv(N2, k0div))
                M = _rup(_cdiv(flat, K0), block)
                K = _rup(_cdiv(flat, M), 8)
                pad = M * K - flat
                skp = jnp.concatenate(
                    [sk, jnp.full((pad,), nb + 1, sk.dtype)]) if pad else sk
                gip = jnp.concatenate(
                    [gi, jnp.zeros((pad,), gi.dtype)]) if pad else gi

                @jax.jit
                def prep(tb, gi2, sk2):
                    skT = sk2.reshape(M, K).T
                    g = jnp.take(tb, gi2, axis=0)
                    st = g.reshape(M, K, L).transpose(1, 2, 0)
                    return skT, st
                skT, st = prep(ptab, gip, skp)
                sync(st)
                flush = jax.jit(
                    lambda k, x: pec.flush_scan(k, x, None, packed=True))
                t(f"flush c={c} W={W} block={block} K={K} M={M}",
                  flush, skT, st)


if __name__ == "__main__":
    main()
