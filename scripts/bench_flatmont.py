"""Prototype: flat Montgomery multiplication (reduction by full inverse).

Standard CIOS reduces with a SERIAL chain of L m-digit steps (each ~6
dependent vector ops -> latency-bound on the VPU). The flat form removes
the chain entirely:

    T  = a*b                       (schoolbook, redundant columns)
    M  = (T mod R) * N' mod R      (N' = -p^-1 mod R, a CONSTANT)
    U  = T + M*p                   (divisible by R exactly)
    out= U / R   (- p if >= p)

All three big steps are sums of independent row-products — ILP-rich —
plus Kogge-Stone carry normalizations (log-depth). ~30% more vector ops
than CIOS but ~2x shorter critical path; wins iff the kernel is
latency-bound (which flush profiling says it is).

MEASURED (v5e, 2026-08-22): correctness OK, but 16.1 us/mul vs CIOS
7.1 us — 2.3x SLOWER. The fully-unrolled accumulation trees (2L^2 row
adds as straight-line SSA) blow the scheduler/register budget instead of
pipelining; the critical-path win never materializes. Round-5 direction:
don't pursue flat reduction in this form — either restructure the
accumulation as (8,TB)-tile adds (vreg-shaped, not row-shaped) or accept
the CIOS latency floor and scale via batch instead.
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
from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.pallas_ec import _KF, _CPARAMS

MASK = np.uint32(0xFFFF)
W16 = np.uint32(16)
TB = 512
GRID = 64
REPS = 16


def sync(o):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))


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
    dt = min(ts) / (REPS * GRID)
    print(f"{name:40s} {dt*1e9:9.1f} ns/mul", flush=True)
    return out


def ks_normalize(rows, n):
    """Exact carry resolution of n redundant u32 columns (< 2^31 each,
    value = sum rows[i] 2^16i) -> n+1 exact 16-bit digit rows.

    Round 1 splits each column (digit + carry <= 2^15); the remaining
    addition digit[i] + carry[i-1] has sums < 2^17, resolved EXACTLY with
    a Kogge-Stone generate/propagate scan over the row index (log-depth,
    handles the full 0xFFFF cascade)."""
    d = [r & MASK for r in rows]
    c = [r >> W16 for r in rows]
    s = [d[0]] + [d[i] + c[i - 1] for i in range(1, n)] + [c[n - 1]]
    n = n + 1
    g = [x >> W16 for x in s]                 # in {0,1}
    dd = [x & MASK for x in s]
    p = [(x == MASK).astype(jnp.uint32) for x in dd]
    # prefix scan: carry OUT of i = g_i | (p_i & carry-out of i-1)
    shift = 1
    while shift < n:
        g = [g[i] | (p[i] & (g[i - shift] if i >= shift else 0))
             for i in range(n)]
        p = [p[i] & (p[i - shift] if i >= shift else jnp.zeros_like(p[i]))
             for i in range(n)]
        shift *= 2
    out = [dd[0]] + [(dd[i] + g[i - 1]) & MASK for i in range(1, n)]
    return out


def make_flat(L, p_limbs, m0_full, TBl):
    """Returns flat_mul(a, b) on (L, TB) 16-bit-digit arrays."""
    Npr = [np.uint32((m0_full >> (16 * i)) & 0xFFFF) for i in range(L)]
    P = [np.uint32(v) for v in p_limbs]

    def accum_tree(prods_lo, prods_hi, width):
        """prods_lo/hi: list of (row_index_offset, (rows, TB) arrays).
        Accumulate into `width` u32 columns with a 4-way split tree."""
        accs = [[jnp.zeros((TBl,), jnp.uint32) for _ in range(width)]
                for _ in range(4)]
        for idx, (off, arr) in enumerate(prods_lo + prods_hi):
            acc = accs[idx & 3]
            R = arr.shape[0]
            for r in range(R):
                if off + r < width:
                    acc[off + r] = acc[off + r] + arr[r]
        out = [accs[0][k] + accs[1][k] + accs[2][k] + accs[3][k]
               for k in range(width)]
        return out

    def flat_mul(a, b):
        # ---- T = a*b (2L+1 redundant columns) --------------------------
        lo_parts, hi_parts = [], []
        for i in range(L):
            prod = a[i] * b            # (L, TB) — wait a[i] is (TB,)
            lo_parts.append((i, prod & MASK))
            hi_parts.append((i + 1, prod >> W16))
        Tcols = accum_tree(lo_parts, hi_parts, 2 * L)
        # normalize T low half to exact digits (needed for M products)
        Td = ks_normalize(Tcols, 2 * L)            # 2L+3 digit rows
        # ---- M = T_low * N' mod R --------------------------------------
        lo_parts, hi_parts = [], []
        for i in range(L):
            row = jnp.stack([Td[i] * Npr[j] for j in range(L - i)])
            lo_parts.append((i, row & MASK))
            hi_parts.append((i + 1, row >> W16))
        Mcols = accum_tree(lo_parts, hi_parts, L)
        Md = ks_normalize(Mcols, L)[:L]            # exact mod R
        # ---- U = T + M*p ------------------------------------------------
        lo_parts, hi_parts = [], []
        for i in range(L):
            row = jnp.stack([Md[i] * P[j] for j in range(L)])
            lo_parts.append((i, row & MASK))
            hi_parts.append((i + 1, row >> W16))
        Ucols = accum_tree(lo_parts, hi_parts, 2 * L + 1)
        Ucols = [u + (Td[k] if k < len(Td) else 0)
                 for k, u in enumerate(Ucols)]
        Ud = ks_normalize(Ucols, 2 * L + 1)
        # low L digits are 0 mod R; result = high digits (carry already
        # propagated by ks_normalize)
        res = Ud[L:2 * L]
        hi_bit = Ud[2 * L]
        # conditional subtract p
        diff = []
        c = jnp.ones((TBl,), jnp.uint32)
        for i in range(L):
            s = res[i] + (MASK - P[i]) + c
            diff.append(s & MASK)
            c = s >> W16
        take = (hi_bit > 0) | (c == 1)
        return jnp.stack([jnp.where(take, d, r) for d, r in zip(diff, res)])

    return flat_mul


def main():
    print("devices:", jax.devices(), flush=True)
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    L = F.L
    p_limbs = tuple(int(v) for v in F.p)
    R = 1 << (16 * L)
    m0_full = (-pow(ctx.p, -1, R)) % R
    flat = make_flat(L, p_limbs, m0_full, TB)

    consts = np.zeros((2, L, 1), np.uint32)
    consts[0, :, 0] = F.p
    consts[1, :, 0] = F.one

    # correctness (interpret off-device too slow; run tiny compiled)
    def kern_c(a_ref, b_ref, o_ref):
        o_ref[:, :] = flat(a_ref[:, :], b_ref[:, :])

    spec = pl.BlockSpec((L, TB), lambda: (0, 0), memory_space=pltpu.VMEM)
    fc = jax.jit(pl.pallas_call(
        kern_c, in_specs=[spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, TB), jnp.uint32),
        compiler_params=_CPARAMS))
    rng = np.random.default_rng(3)
    av = [int.from_bytes(rng.bytes(47), "big") % ctx.p for _ in range(TB)]
    bv = [int.from_bytes(rng.bytes(47), "big") % ctx.p for _ in range(TB)]
    av[0], av[1] = 0, ctx.p - 1
    bv[0], bv[1] = ctx.p - 1, ctx.p - 1
    aT = jnp.asarray(np.asarray(F.encode(av)).T.copy())
    bT = jnp.asarray(np.asarray(F.encode(bv)).T.copy())
    got = F.decode(np.asarray(fc(aT, bT)).T)
    want = [x * y % ctx.p for x, y in zip(av, bv)]
    print("flat mul correctness:", "OK" if got == want else "FAIL",
          flush=True)
    if got != want:
        bad = [i for i in range(TB) if got[i] != want[i]][:5]
        print("first bad lanes:", bad)
        return

    # timing: dependent chains, REPS muls per grid step
    def kern_flat(a_ref, o_ref):
        x = a_ref[:, :]
        for _ in range(REPS):
            x = flat(x, x)
        o_ref[:, :] = x

    def kern_cios(a_ref, c_ref, o_ref, t_ref):
        kf = _KF(L, p_limbs, np.uint32(F.m0ninv), c_ref[0], c_ref[1], t_ref)
        x = a_ref[:, :]
        for _ in range(REPS):
            x = kf.mul(x, x)
        o_ref[:, :] = x

    gspec = pl.BlockSpec((L, TB), lambda i: (0, 0), memory_space=pltpu.VMEM)
    f_flat = jax.jit(pl.pallas_call(
        kern_flat, grid=(GRID,), in_specs=[gspec], out_specs=gspec,
        out_shape=jax.ShapeDtypeStruct((L, TB), jnp.uint32),
        compiler_params=_CPARAMS))
    f_cios = jax.jit(pl.pallas_call(
        kern_cios, grid=(GRID,),
        in_specs=[gspec, pl.BlockSpec((2, L, 1), lambda i: (0, 0, 0),
                                      memory_space=pltpu.VMEM)],
        out_specs=gspec,
        out_shape=jax.ShapeDtypeStruct((L, TB), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32)],
        compiler_params=_CPARAMS))
    x0 = jnp.asarray(rng.integers(0, 2**16, size=(L, TB), dtype=np.uint32))
    t("CIOS mul (dependent chain)", f_cios, x0, jnp.asarray(consts))
    t("FLAT mul (dependent chain)", f_flat, x0)


if __name__ == "__main__":
    main()
