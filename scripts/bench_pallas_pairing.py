"""Throughput of the fused Pallas pairing at several batch sizes."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from constantine_tpu.ops.pairing import get_pairing
from constantine_tpu.ops.pallas_pairing import get_pallas_pairing
from constantine_tpu.utils import refmath as rm


def sync(o):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))


def t(f, reps=3, pipeline=4):
    sync(f())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(pipeline):
            out = f()
        sync(out)
        ts.append((time.time() - t0) / pipeline)
    return min(ts)


def main():
    pr = get_pairing("BLS12_381")
    pp = get_pallas_pairing()
    ctx = pr.ctx
    rng = np.random.default_rng(5)
    Bmax = 2048
    ks = [int(k) for k in rng.integers(2, 2**60, size=64)]
    g1 = [rm.ec_mul(k, ctx.g, 0, ctx.p) for k in ks]
    nrr = ctx.params.fp2_nonresidue
    g2 = [rm.ec2_mul(int(k), ctx.g2_aff, (0, 0), nrr, ctx.p)
          for k in rng.integers(2, 2**60, size=64)]
    pxs = np.asarray(ctx.fp.encode([p[0] for p in g1]))
    pys = np.asarray(ctx.fp.encode([p[1] for p in g1]))
    qxs = np.stack([pr.fp2.encode(list(q[0])) for q in g2])
    qys = np.stack([pr.fp2.encode(list(q[1])) for q in g2])

    def tile(a, B):
        reps = -(-B // a.shape[0])
        return jnp.asarray(np.concatenate([a] * reps)[:B])

    for B in (4, 64, 256, 1024, 2048):
        px, py = tile(pxs, B), tile(pys, B)
        qx, qy = tile(qxs, B), tile(qys, B)
        f = jax.jit(lambda px=px, py=py, qx=qx, qy=qy:
                    pp.final_exp(pp.miller((px, py), (qx, qy))))
        dt = t(f)
        print(f"B={B:5d}: {dt*1e3:9.2f} ms  -> {B/dt:9.1f} pairings/s "
              f"(ref serial 2601.7/s)", flush=True)
        # pairing_check shape (product + single final exp)
        g = jax.jit(lambda px=px, py=py, qx=qx, qy=qy:
                    pp.pairing_check((px, py), (qx, qy)))
        dt = t(g)
        print(f"   check B={B}: {dt*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
