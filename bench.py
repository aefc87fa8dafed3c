"""Headline benchmark: BLS12-381 G1 Pippenger MSM on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): reference MSM 2^16 = 51.28 ms on 16-thread Ryzen
7840U (19.50 ops/s) — bench_ec_msm_bls12_381_g1.nim parity config.

Env knobs:
  CTT_BENCH_METRIC  msm (default) | ntt | pairing | eip4844_commit
                    | eip4844_verify
  CTT_BENCH_N       input size for msm/ntt (default 65536)
  CTT_BENCH_REPS    timing repetitions (default 3)
  CTT_BENCH_CPU=1   force the CPU backend (debug)
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
    """Force device completion: block_until_ready does NOT wait for
    execution on the axon tunnel backend (verified: dependent-chain
    kernels "finish" below the HBM bandwidth floor) — a 4-byte readback
    does."""
    import jax
    import numpy as _np
    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "ravel")]
    if leaves:                      # bytes/bool outputs are already synced
        _np.asarray(jax.device_get(leaves[0].ravel()[:1]))
    return out


def _time(f, reps, pipeline: int = 8):
    """Per-op time with `pipeline` async dispatches per measurement.

    On this setup the TPU sits behind a tunnel with ~25 ms RTT per
    synchronous round trip; queueing K dispatches before syncing measures
    device throughput (the quantity the reference's ops/s numbers report)
    instead of link latency. Single-op latency is also logged.
    """
    _sync(f())
    t0 = time.time()
    _sync(f())
    log(f"single-dispatch latency (incl link RTT): {(time.time()-t0)*1e3:.1f} ms")
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(pipeline):
            out = f()
        _sync(out)
        ts.append((time.time() - t0) / pipeline)
    return min(ts)


def bench_msm(n, reps):
    import jax
    import jax.numpy as jnp
    from constantine_tpu.named.precompute import get_curve
    from constantine_tpu.ops.msm import msm_jit

    ctx = get_curve("BLS12_381")
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

    hi = rng.integers(0, 2**64, size=(n, 3), dtype=np.uint64)
    full = [int(a) | (int(b[0]) << 64) | (int(b[1]) << 128) | (int(b[2]) << 192)
            for a, b in zip(rng.integers(0, 2**64, size=n, dtype=np.uint64), hi)]
    scalars = jnp.asarray(ctx.scalars_to_limbs([v % ctx.r for v in full]))

    f = msm_jit(ctx.g1)
    t0 = time.time()
    jax.block_until_ready(f((px, py), scalars, scalar_bits=255))
    log(f"compile+first run: {time.time()-t0:.1f}s")
    dt = _time(lambda: f((px, py), scalars, scalar_bits=255), reps)
    ops = 1.0 / dt
    # Reference 16-thread MSM wall times (BASELINE.md, 7840U, ms); linear
    # extrapolation from 2^16 elsewhere (conservative: the reference scales
    # sublinearly per point, so the fake baseline is faster than reality).
    msm_baseline_ms = {32768: 25.01, 65536: 51.28,
                      131072: 88.71, 262144: 162.14}
    baseline_ops = 1000.0 / msm_baseline_ms.get(n, 51.28 * n / 65536)
    log(f"msm({n}): {dt*1e3:.1f} ms  ({ops:.2f} ops/s)")
    return f"bls12381_g1_msm_{n}", ops, "ops/s", ops / baseline_ops


def bench_ntt(n, reps):
    import jax
    import jax.numpy as jnp
    from constantine_tpu.named.precompute import get_curve
    from constantine_tpu.ops.ntt import get_domain

    log_n = int(np.log2(n))
    dom = get_domain("BLS12_381", log_n)
    ctx = get_curve("BLS12_381")
    rng = np.random.default_rng(7)
    x = jnp.asarray(ctx.fr.encode(
        [int(v) for v in rng.integers(0, 2**62, size=n)]))
    jax.block_until_ready(dom.ntt(x))
    dt = _time(lambda: dom.ntt(x), reps)
    ops = 1.0 / dt
    # BASELINE.md: reference Fr NTT 2^16 not separately tabled; the FFT
    # bench (bench_fft_fields.nim) runs ~6.7 ms serial at 2^16 on 7840U.
    baseline_ops = (1.0 / 6.7e-3) * (65536 / n)
    log(f"ntt({n}): {dt*1e3:.2f} ms")
    return f"bls12381_fr_ntt_{n}", ops, "ops/s", ops / baseline_ops


def bench_pairing(_n, reps):
    import jax
    import jax.numpy as jnp
    from constantine_tpu.ops.pairing import get_pairing
    from constantine_tpu.utils import refmath as rm

    pr = get_pairing("BLS12_381")
    ctx = pr.ctx
    rng = np.random.default_rng(5)
    # multi-pairing batch — batched Miller is the TPU win: at small B the
    # program is op-launch-bound (~1us per tiny HLO/kernel op), so the
    # honest throughput metric uses a production-sized batch.
    B = int(os.environ.get("CTT_BENCH_B", 256))
    ks = [int(k) for k in rng.integers(2, 2**60, size=B)]
    g1 = [rm.ec_mul(k, ctx.g, 0, ctx.p) for k in ks]
    px = jnp.asarray(ctx.fp.encode([p[0] for p in g1]))
    py = jnp.asarray(ctx.fp.encode([p[1] for p in g1]))
    nrr = ctx.params.fp2_nonresidue
    g2 = [rm.ec2_mul(int(k), ctx.g2_aff, (0, 0), nrr, ctx.p)
          for k in rng.integers(2, 2**60, size=B)]
    qx = jnp.asarray(np.stack([pr.fp2.encode(list(q[0])) for q in g2]))
    qy = jnp.asarray(np.stack([pr.fp2.encode(list(q[1])) for q in g2]))

    f = jax.jit(pr.pairing)
    jax.block_until_ready(f((px, py), (qx, qy)))
    dt = _time(lambda: f((px, py), (qx, qy)), reps)
    per = dt / B
    ops = 1.0 / per
    baseline_ops = 1.0 / 384.4e-6  # 7840U single pairing 384.4 us
    log(f"pairing batch {B}: {dt*1e3:.2f} ms total, {per*1e6:.0f} us/pair")
    return (f"bls12381_pairing_batch{B}", ops, "pairings/s",
            ops / baseline_ops)


def bench_eip4844(kind, reps):
    import jax
    from constantine_tpu.models import eip4844

    rng = np.random.default_rng(3)
    r = (52435875175126190479447740508185965837690552500527637822603658699938581184513)
    blob = b"".join(
        int(rng.integers(0, 2**62)).to_bytes(32, "big") for _ in range(4096))
    t0 = time.time()
    c = eip4844.blob_to_kzg_commitment(blob)
    log(f"setup+first commit: {time.time()-t0:.1f}s")
    if kind == "commit_batch":
        B = int(os.environ.get("CTT_BENCH_B", 16))
        blobs = [b"".join(int(v).to_bytes(32, "big")
                          for v in rng.integers(0, 2**62, size=4096))
                 for _ in range(B)]
        dt = _time(lambda: eip4844.blob_to_kzg_commitment_batch(blobs),
                   reps, pipeline=1) / B
        ops = 1.0 / dt
        log(f"blob_to_kzg_commitment batch {B}: {dt*1e3:.2f} ms/blob")
        return (f"eip4844_commit_batch{B}", ops, "blobs/s", ops / 226.7)
    if kind == "commit":
        dt = _time(lambda: eip4844.blob_to_kzg_commitment(blob), reps)
        ops = 1.0 / dt
        log(f"blob_to_kzg_commitment: {dt*1e3:.2f} ms")
        return "eip4844_blob_to_kzg_commitment", ops, "ops/s", ops / 226.7
    if kind == "verify_blob_batch":
        B = int(os.environ.get("CTT_BENCH_B", 64))
        blobs = [b"".join(int(v).to_bytes(32, "big")
                          for v in rng.integers(0, 2**62, size=4096))
                 for _ in range(B)]
        cs = [eip4844.blob_to_kzg_commitment(bl) for bl in blobs]
        prs = [eip4844.compute_blob_kzg_proof(bl, c)
               for bl, c in zip(blobs, cs)]
        assert eip4844.verify_blob_kzg_proof_batch(blobs, cs, prs) is True
        dt = _time(lambda: eip4844.verify_blob_kzg_proof_batch(
            blobs, cs, prs), reps, pipeline=1) / B
        ops = 1.0 / dt
        log(f"verify_blob_kzg_proof_batch({B}): {dt*1e3:.2f} ms/blob")
        # BASELINE.md: verify_blob_kzg_proof_batch(64) 16T = 8.19 ms/blob
        return (f"eip4844_verify_blob_batch{B}", ops, "blobs/s",
                ops / (1000.0 / 8.19))
    z = (2**200 + 12345).to_bytes(32, "big")
    proof, y = eip4844.compute_kzg_proof(blob, z)
    dt = _time(lambda: eip4844.verify_kzg_proof(c, z, y, proof), reps)
    ops = 1.0 / dt
    log(f"verify_kzg_proof: {dt*1e3:.2f} ms")
    return "eip4844_verify_kzg_proof", ops, "ops/s", ops / 1297.9


def main():
    import jax
    if os.environ.get("CTT_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    metric = os.environ.get("CTT_BENCH_METRIC", "msm")
    n = int(os.environ.get("CTT_BENCH_N", 65536))
    reps = int(os.environ.get("CTT_BENCH_REPS", 3))
    log(f"devices: {jax.devices()}  metric={metric} N={n}")

    if metric == "msm":
        name, val, unit, vs = bench_msm(n, reps)
    elif metric == "ntt":
        name, val, unit, vs = bench_ntt(n, reps)
    elif metric == "pairing":
        name, val, unit, vs = bench_pairing(n, reps)
    elif metric == "eip4844_commit":
        name, val, unit, vs = bench_eip4844("commit", reps)
    elif metric == "eip4844_commit_batch":
        name, val, unit, vs = bench_eip4844("commit_batch", reps)
    elif metric == "eip4844_verify":
        name, val, unit, vs = bench_eip4844("verify", reps)
    elif metric == "eip4844_verify_blob_batch":
        name, val, unit, vs = bench_eip4844("verify_blob_batch", reps)
    else:
        raise SystemExit(f"unknown CTT_BENCH_METRIC {metric}")
    print(json.dumps({"metric": name, "value": round(val, 3), "unit": unit,
                      "vs_baseline": round(vs, 3)}))


if __name__ == "__main__":
    main()
