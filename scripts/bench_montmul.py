"""Microbenchmark: Montgomery-mul Pallas kernel variants on the real chip.

Measures ns per lane-multiplication for:
  v0: current _KF.mul (VMEM scratch accumulator, slice RMW)
  v1: register-resident accumulator as rolled full arrays
  v2: v0 but batched K muls per grid step (amortize prologue)
  raw: u32 multiply-add throughput ceiling
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.pallas_ec import get_pallas_ec, _KF

MASK = np.uint32(0xFFFF)
W = 16


def timeit(name, f, *args, reps=5, inner=1, per=1):
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = f(*args)
        jax.block_until_ready(out)
        ts.append((time.time() - t0) / inner)
    dt = min(ts)
    print(f"{name:28s} {dt*1e3:9.3f} ms   {dt/per*1e9:8.3f} ns/unit")
    return dt


def main():
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    L = F.L
    N = 1 << 20
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(L, N)), jnp.uint32)
    b = jnp.asarray(rng.integers(0, 1 << 16, size=(L, N)), jnp.uint32)
    p_limbs = tuple(int(v) for v in F.p)
    m0 = np.uint32(F.m0ninv)
    consts = np.zeros((2, L, 128), np.uint32)
    consts[0] = np.asarray(F.p, np.uint32)[:, None]
    consts[1] = np.asarray(F.one, np.uint32)[:, None]
    print("devices:", jax.devices())

    TB = 512

    # ---- v0: current kernel (scratch accumulator) --------------------------
    def kern_v0(a_ref, b_ref, c_ref, o_ref, t_ref):
        kf = _KF(L, p_limbs, m0, c_ref[0, :, :1], c_ref[1, :, :1], t_ref)
        o_ref[:, :] = kf.mul(a_ref[:, :], b_ref[:, :])

    v0 = pl.pallas_call(
        kern_v0, grid=(N // TB,),
        in_specs=[pl.BlockSpec((L, TB), lambda i: (0, i)),
                  pl.BlockSpec((L, TB), lambda i: (0, i)),
                  pl.BlockSpec((2, L, 128), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((L, TB), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32)],
    )
    v0j = jax.jit(lambda x, y: v0(x, y, consts))

    # ---- v1: no scratch — aligned accumulators, single shift at end --------
    # SOS-style: accumulate the full 2L-column product with the shift
    # expressed as a concat (static), then one fused Montgomery reduction
    # sweep. All adds on full arrays; no VMEM RMW.
    def kern_v1(a_ref, b_ref, c_ref, o_ref):
        av = a_ref[:, :]
        bv = b_ref[:, :]
        tb = av.shape[1]
        zrow = jnp.zeros((1, tb), jnp.uint32)
        # full product, column accumulation: t has 2L rows (plus carry room)
        t = jnp.zeros((2 * L, tb), jnp.uint32)
        def shifted(rows_block, off):
            parts = []
            if off:
                parts.append(jnp.zeros((off, tb), jnp.uint32))
            parts.append(rows_block)
            rem = 2 * L - off - rows_block.shape[0]
            if rem:
                parts.append(jnp.zeros((rem, tb), jnp.uint32))
            return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

        for i in range(L):
            prod = av[i:i + 1, :] * bv          # (L, tb)
            lo = prod & MASK
            hi = prod >> W
            t = t + shifted(lo, i) + shifted(hi, i + 1)
        # Montgomery reduction sweep (sequential in i, rows stay aligned;
        # array-wide adds of statically shifted prod2 contributions)
        p_col = c_ref[0, :, :1]
        carry = jnp.zeros((1, tb), jnp.uint32)
        for i in range(L):
            cur = t[i:i + 1, :] + carry
            mi = (cur * m0) & MASK
            prod2 = mi * p_col
            lo2 = prod2 & MASK
            hi2 = prod2 >> W
            t = t + shifted(lo2, i) + shifted(hi2, i + 1)
            carry = (cur + lo2[0:1, :]) >> W
        out = [t[L + i, :] for i in range(L)] + [jnp.zeros((tb,), jnp.uint32)]
        out[0] = out[0] + carry[0]
        for i in range(L):
            cc = out[i] >> W
            out[i] = out[i] & MASK
            out[i + 1] = out[i + 1] + cc
        o_ref[:, :] = jnp.stack(out[:L], 0)

    v1 = pl.pallas_call(
        kern_v1, grid=(N // TB,),
        in_specs=[pl.BlockSpec((L, TB), lambda i: (0, i)),
                  pl.BlockSpec((L, TB), lambda i: (0, i)),
                  pl.BlockSpec((2, L, 128), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((L, TB), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
    )
    v1j = jax.jit(lambda x, y: v1(x, y, consts))

    # ---- raw multiply-add ceiling ------------------------------------------
    def kern_raw(a_ref, b_ref, o_ref):
        av = a_ref[:, :]
        bv = b_ref[:, :]
        acc = jnp.zeros_like(av)
        for i in range(48):
            acc = acc + av * bv
            av = av + acc
        o_ref[:, :] = acc

    raw = pl.pallas_call(
        kern_raw, grid=(N // TB,),
        in_specs=[pl.BlockSpec((L, TB), lambda i: (0, i)),
                  pl.BlockSpec((L, TB), lambda i: (0, i))],
        out_specs=pl.BlockSpec((L, TB), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
    )
    rawj = jax.jit(raw)

    r0 = timeit("v0 scratch-CIOS", v0j, a, b, per=N)
    r1 = timeit("v1 aligned-SOS", v1j, a, b, per=N)
    rr = timeit("raw 48x (mul+2add) L-rows", rawj, a, b, per=N)
    print(f"raw per (mul+2add) on (L,N): {rr/48*1e9:.3f} ns/lane")

    # correctness spot check of v1 vs XLA field mul
    am = jnp.asarray(F.encode([12345678901234567890123456789]))
    bm = jnp.asarray(F.encode([98765432109876543210987654321]))
    ref = F.mul(am, bm)
    got = v1j(jnp.broadcast_to(am.reshape(L, 1), (L, TB)),
              jnp.broadcast_to(bm.reshape(L, 1), (L, TB)))[:, 0]
    print("v1 correct:", bool(jnp.all(got == ref.reshape(L))))


if __name__ == "__main__":
    main()
