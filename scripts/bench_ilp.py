"""Does interleaving independent Montgomery-mul chains in one kernel body
raise throughput? If yes, the flush kernel should process 2+ column blocks
per invocation."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.pallas_ec import _KF, _CPARAMS

L = 24
GRID = 64
REPS = 16


def sync(o):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))


def t(name, f, *args, reps=3, pipeline=4, chains=1, tb=512):
    out = f(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(pipeline):
            out = f(*args)
        sync(out)
        ts.append((time.time() - t0) / pipeline)
    dt = min(ts) / (REPS * GRID)
    lanes = chains * tb
    print(f"{name:46s} {dt*1e9:8.1f} ns/mul-round  "
          f"({dt*1e9/lanes*1000:6.2f} ps/lane)", flush=True)


def make(nchains, TB):
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    p_limbs = tuple(int(v) for v in F.p)
    m0 = np.uint32(F.m0ninv)
    consts = np.zeros((2, L, 1), np.uint32)
    consts[0, :, 0] = F.p
    consts[1, :, 0] = F.one

    def kern(a_ref, c_ref, o_ref, *t_refs):
        kfs = [_KF(L, p_limbs, m0, c_ref[0], c_ref[1], t)
               for t in t_refs]
        xs = [a_ref[:, i * TB:(i + 1) * TB] for i in range(nchains)]
        for _ in range(REPS):
            xs = [kf.mul(x, x) for kf, x in zip(kfs, xs)]
        o_ref[:, :] = jnp.concatenate(xs, axis=1) if nchains > 1 else xs[0]

    W = nchains * TB
    spec = pl.BlockSpec((L, W), lambda i: (0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[spec, pl.BlockSpec((2, L, 1), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, W), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32)] * nchains,
        compiler_params=_CPARAMS)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**16, size=(L, W), dtype=np.uint32))
    return jax.jit(fn), a, jnp.asarray(consts)


def main():
    print("devices:", jax.devices(), flush=True)
    for nchains, TB in [(1, 512), (2, 512), (4, 256)]:
        fn, a, c = make(nchains, TB)
        t(f"{nchains} chain(s) x (24,{TB})", fn, a, c,
          chains=nchains, tb=TB)


if __name__ == "__main__":
    main()
