"""A/B the Kogge-Stone carry propagation (CTT_KS) against the serial
ripple on the real chip: times the full MSM pipeline and a bare madd
elementwise kernel. Run twice: CTT_KS=0 python scripts/bench_ks.py / =1."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.pallas_ec import get_pallas_ec


def sync(o):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))


def t(name, f, reps=3, pipeline=8):
    sync(f())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(pipeline):
            out = f()
        sync(out)
        ts.append((time.time() - t0) / pipeline)
    print(f"{name:32s} {min(ts)*1e3:9.2f} ms", flush=True)
    return min(ts)


def main():
    print(f"CTT_KS={os.environ.get('CTT_KS', '1')}")
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    pec = get_pallas_ec(F)
    rng = np.random.default_rng(3)
    N = 1 << 16

    # random-ish field elements (canonical digits; not on curve — rate only)
    def rnd(shape):
        v = rng.integers(0, 2**16, size=shape, dtype=np.uint32)
        v[..., -1, :] &= 0x1FFF
        return jnp.asarray(v)

    P = (rnd((F.L, N)), rnd((F.L, N)), rnd((F.L, N)))
    Q = (rnd((F.L, N)), rnd((F.L, N)))

    madd = jax.jit(lambda: pec.madd(P, Q))
    dt = t("madd elementwise 2^16", madd)
    print(f"  -> {dt/N*1e9:.1f} ns/lane-madd")

    dbl = jax.jit(lambda: pec.double(P))
    t("double elementwise 2^16", dbl)

    # full MSM
    from constantine_tpu.ops.msm import msm_jit
    ks = jnp.asarray(ctx.scalars_to_limbs(
        [int(v) for v in rng.integers(1, 2**63, size=N)]))
    G = ctx.g1.from_affine(tuple(
        jnp.broadcast_to(g, (N,) + g.shape[1:]) for g in ctx.g1_gen))
    pts = ctx.g1.scalar_mul(ks, G, scalar_bits=64)
    (px, py), _ = ctx.g1.to_affine(pts)
    px.block_until_ready()
    f = msm_jit(ctx.g1)
    dt = t("msm 2^16", lambda: f((px, py), ks, scalar_bits=255))
    print(f"  -> {1.0/dt:.2f} ops/s (baseline 19.50)")


if __name__ == "__main__":
    main()
