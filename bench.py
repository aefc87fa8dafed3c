"""Headline benchmark: BLS12-381 G1 Pippenger MSM on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): reference MSM 2^16 = 51.28 ms on 16-thread Ryzen
7840U (19.50 ops/s) — bench_ec_msm_bls12_381_g1.nim parity config.

Env knobs: CTT_BENCH_N (default 65536), CTT_BENCH_REPS (default 3),
CTT_BENCH_CPU=1 to force the CPU backend (debug).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    if os.environ.get("CTT_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from constantine_tpu.named.precompute import get_curve
    from constantine_tpu.ops.msm import msm_jit

    n = int(os.environ.get("CTT_BENCH_N", 65536))
    reps = int(os.environ.get("CTT_BENCH_REPS", 3))
    log(f"devices: {jax.devices()}  N={n}")

    ctx = get_curve("BLS12_381")

    # generate N pseudorandom points on-device: [k]G with 64-bit k, batched
    rng = np.random.default_rng(42)
    ks = jnp.asarray(ctx.scalars_to_limbs(
        [int(v) for v in rng.integers(1, 2**63, size=n)]))
    G = ctx.g1.from_affine(tuple(
        jnp.broadcast_to(g, (n,) + g.shape[1:]) for g in ctx.g1_gen))
    t0 = time.time()
    pts = ctx.g1.scalar_mul(ks, G, scalar_bits=64)
    (px, py), _ = ctx.g1.to_affine(pts)
    px.block_until_ready()
    log(f"point generation: {time.time()-t0:.1f}s")

    # full-width random scalars: combine four 64-bit draws across limbs
    hi = rng.integers(0, 2**64, size=(n, 3), dtype=np.uint64)
    full = [int(a) | (int(b[0]) << 64) | (int(b[1]) << 128) | (int(b[2]) << 192)
            for a, b in zip(rng.integers(0, 2**64, size=n, dtype=np.uint64), hi)]
    scalars = jnp.asarray(ctx.scalars_to_limbs([v % ctx.r for v in full]))

    f = msm_jit(ctx.g1)
    t0 = time.time()
    res = f((px, py), scalars, scalar_bits=255)
    jax.block_until_ready(res)
    log(f"compile+first run: {time.time()-t0:.1f}s")

    times = []
    for _ in range(reps):
        t0 = time.time()
        res = f((px, py), scalars, scalar_bits=255)
        jax.block_until_ready(res)
        times.append(time.time() - t0)
    dt = min(times)
    ops = 1.0 / dt
    baseline_ops = 19.50 * (65536 / n)  # scale baseline if N overridden
    log(f"msm({n}): {dt*1e3:.1f} ms  ({ops:.2f} ops/s)")
    print(json.dumps({
        "metric": f"bls12381_g1_msm_{n}",
        "value": round(ops, 3),
        "unit": "ops/s",
        "vs_baseline": round(ops / baseline_ops, 3),
    }))


if __name__ == "__main__":
    main()
