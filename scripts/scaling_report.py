"""Scaling-efficiency harness: sharded MSM + distributed NTT over 1/2/4/8
mesh devices, fixed GLOBAL problem size (strong scaling).

Emits SCALING_r05.json. On real multi-chip hardware the efficiency column
is the BASELINE.json north-star number (>= 70% multi-host); on this box the
8 "devices" are virtual CPU shards of 2 physical cores, so the recorded
efficiency measures sharding OVERHEAD (collectives + layout), not speedup —
the `virtual_cpu` flag marks that. Run with:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/scaling_report.py
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", os.environ.get("CTT_SCALE_BACKEND", "cpu"))

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.parallel.mesh import make_mesh, DATA_AXIS
from constantine_tpu.parallel.msm_sharded import msm_sharded
from constantine_tpu.parallel.ntt_sharded import ShardedNTT
from constantine_tpu.utils import refmath as rm


def timeit(f, reps=3):
    jax.block_until_ready(f())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(f())
        ts.append(time.time() - t0)
    return min(ts)


def main():
    ctx = get_curve("BLS12_381")
    N = int(os.environ.get("CTT_SCALE_N", 4096))
    LOG_NTT = int(os.environ.get("CTT_SCALE_LOGN", 14))
    rng = np.random.default_rng(4)
    ks = [int(k) for k in rng.integers(1, 2**20, size=N)]
    # cheap point set: one host mul per distinct small k
    cache = {}
    pts = []
    for k in ks:
        if k not in cache:
            cache[k] = rm.ec_mul(k, ctx.g, 0, ctx.p)
        pts.append(cache[k])
    px = np.asarray(ctx.fp.encode([p[0] for p in pts]))
    py = np.asarray(ctx.fp.encode([p[1] for p in pts]))
    sc = np.asarray(ctx.scalars_to_limbs(
        [int(s) for s in rng.integers(1, 2**62, size=N)]))
    x_ntt = np.asarray(ctx.fr.encode(
        [int(v) for v in rng.integers(0, 2**62, size=1 << LOG_NTT)]))

    rows = []
    t1_msm = t1_ntt = None
    for nd in (1, 2, 4, 8):
        if nd > jax.device_count():
            break
        mesh = make_mesh(nd)
        sh = NamedSharding(mesh, P(DATA_AXIS))
        pxd = jax.device_put(jnp.asarray(px), sh)
        pyd = jax.device_put(jnp.asarray(py), sh)
        scd = jax.device_put(jnp.asarray(sc), sh)
        t_msm = timeit(lambda: msm_sharded(ctx.g1, mesh, (pxd, pyd), scd,
                                           scalar_bits=62))
        snt = ShardedNTT("BLS12_381", LOG_NTT, max(1, nd.bit_length() - 1),
                         mesh)
        xd = jnp.asarray(x_ntt)
        t_ntt = timeit(lambda: snt.ntt(xd))
        if nd == 1:
            t1_msm, t1_ntt = t_msm, t_ntt
        rows.append({
            "devices": nd,
            "msm_ms": round(t_msm * 1e3, 2),
            "msm_efficiency": round(t1_msm / (nd * t_msm), 3),
            "ntt_ms": round(t_ntt * 1e3, 2),
            "ntt_efficiency": round(t1_ntt / (nd * t_ntt), 3),
        })
        print(rows[-1], flush=True)

    out = {
        "backend": jax.default_backend(),
        "virtual_cpu": jax.default_backend() == "cpu",
        "note": ("virtual CPU devices share 2 physical cores: efficiency "
                 "here measures sharding overhead, not parallel speedup; "
                 "the >=70% north-star target applies to real multi-chip "
                 "meshes" if jax.default_backend() == "cpu" else
                 "real accelerator mesh"),
        "global_msm_n": N,
        "global_ntt_logn": LOG_NTT,
        "strong_scaling": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
