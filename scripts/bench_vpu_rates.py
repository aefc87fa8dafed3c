"""Raw VPU op-rate probe: dependent-chain u32 multiply vs f32 FMA vs u32
add, on (32, 512) tiles inside one Pallas kernel.

Decides whether an f32-digit CIOS (11-bit digits, FMA accumulate) could
beat the u32 16-bit-digit CIOS in the MSM flush kernel.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from constantine_tpu.ops.pallas_ec import _CPARAMS

R, TB = 32, 512
REPS = 2048


def sync(o):
    return np.asarray(jax.device_get(o.ravel()[:1]))


def t(name, fn, x, iters, reps=3, pipeline=4):
    out = fn(x)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(pipeline):
            out = fn(x)
        sync(out)
        ts.append((time.time() - t0) / pipeline)
    dt = min(ts)
    per_op = dt / (iters * R * TB)
    print(f"{name:34s} {dt*1e3:7.2f} ms  {per_op*1e12:7.2f} ps/lane-op "
          f"({1.0/(per_op*1e9):6.1f} Gop/s)", flush=True)


def kern_u32_mul(x_ref, o_ref):
    x = x_ref[:, :]
    y = x | jnp.uint32(1)
    for _ in range(REPS):
        x = x * y
    o_ref[:, :] = x


def kern_u32_mul_ilp4(x_ref, o_ref):
    x = x_ref[:, :]
    y = x | jnp.uint32(1)
    a, b, c, d = x, x + 1, x + 2, x + 3
    for _ in range(REPS // 4):
        a = a * y
        b = b * y
        c = c * y
        d = d * y
    o_ref[:, :] = a + b + c + d


def kern_u32_add(x_ref, o_ref):
    x = x_ref[:, :]
    y = x | jnp.uint32(1)
    for _ in range(REPS):
        x = x + y
    o_ref[:, :] = x


def kern_u32_mask_shift(x_ref, o_ref):
    x = x_ref[:, :]
    for _ in range(REPS // 2):
        x = (x & jnp.uint32(0xFFFF)) + (x >> jnp.uint32(16))
    o_ref[:, :] = x


def kern_f32_fma(x_ref, o_ref):
    x = x_ref[:, :].astype(jnp.float32)
    y = x * 0.5 + 1.0
    acc = x
    for _ in range(REPS):
        acc = acc * y + x          # fused multiply-add
    o_ref[:, :] = acc.astype(jnp.uint32)


def kern_f32_fma_ilp4(x_ref, o_ref):
    x = x_ref[:, :].astype(jnp.float32)
    y = x * 0.5 + 1.0
    a, b, c, d = x, x + 1, x + 2, x + 3
    for _ in range(REPS // 4):
        a = a * y + x
        b = b * y + x
        c = c * y + x
        d = d * y + x
    o_ref[:, :] = (a + b + c + d).astype(jnp.uint32)


def run(kern):
    spec = pl.BlockSpec((R, TB), lambda: (0, 0), memory_space=pltpu.VMEM)
    return jax.jit(pl.pallas_call(
        kern, in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((R, TB), jnp.uint32),
        compiler_params=_CPARAMS))


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 2**15, size=(R, TB), dtype=np.uint32))
    t("u32 mul (dependent chain)", run(kern_u32_mul), x, REPS)
    t("u32 mul (4-way ILP)", run(kern_u32_mul_ilp4), x, REPS)
    t("u32 add (dependent chain)", run(kern_u32_add), x, REPS)
    t("u32 mask+shift+add", run(kern_u32_mask_shift), x, REPS)
    t("f32 fma (dependent chain)", run(kern_f32_fma), x, REPS)
    t("f32 fma (4-way ILP)", run(kern_f32_fma_ilp4), x, REPS)


if __name__ == "__main__":
    main()
