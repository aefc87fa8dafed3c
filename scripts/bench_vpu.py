"""VPU microbenchmarks: u32 multiply lowering cost, aligned vs unaligned
VMEM slice RMW, and candidate Montgomery-mul kernel variants.

Each kernel runs `REPS` dependent iterations of its body over a (L*, TB)
tile so the measured time is pure in-kernel compute (one grid step, no HBM
traffic in the loop). Times are per-iteration per-lane.
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

TB = 512
L = 24
REPS = 256
GRID = 64          # grid steps per call; total iters = REPS * GRID
MASK = np.uint32(0xFFFF)


def sync(o):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))


def t(name, f, *args, reps=3, pipeline=4, iters=REPS):
    out = f(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(pipeline):
            out = f(*args)
        sync(out)
        ts.append((time.time() - t0) / pipeline)
    dt = min(ts) / (iters * GRID)
    print(f"{name:44s} {dt*1e9:10.1f} ns/iter  ({dt*1e9/TB*1000:.2f} ps/lane)",
          flush=True)
    return out


def run1(body, n_scratch_rows=0, nin=1):
    """GRID grid steps; body(refs...) loops REPS times internally."""
    def kern(*refs):
        body(*refs)

    scratch = [pltpu.VMEM((n_scratch_rows, TB), jnp.uint32)] if n_scratch_rows else []
    fn = pl.pallas_call(
        kern,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((L, TB), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * nin,
        out_specs=pl.BlockSpec((L, TB), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, TB), jnp.uint32),
        scratch_shapes=scratch,
    )
    return jax.jit(fn)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 2**16, size=(L, TB), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**16, size=(L, TB), dtype=np.uint32))

    # 1. chain of dependent u32 multiplies (24, TB)
    def mul_chain(a_ref, o_ref):
        x = a_ref[:, :]
        for _ in range(REPS):
            x = x * x
        o_ref[:, :] = x
    t("u32 mul chain (24,TB)", run1(mul_chain), a)

    # 1b. chain of dependent u32 adds
    def add_chain(a_ref, o_ref):
        x = a_ref[:, :]
        for _ in range(REPS):
            x = x + x
        o_ref[:, :] = x
    t("u32 add chain (24,TB)", run1(add_chain), a)

    # 1c. 16x16 exact product + mask/shift (the CIOS inner primitive)
    def mul16_chain(a_ref, o_ref):
        x = a_ref[:, :]
        for _ in range(REPS):
            p = x * x
            x = (p & MASK) + (p >> np.uint32(16))
        o_ref[:, :] = x
    t("mul+mask+shift+add chain", run1(mul16_chain), a)

    # 2. aligned VMEM RMW: t[0:24] += x
    def rmw_aligned(a_ref, o_ref, t_ref):
        x = a_ref[:, :]
        for _ in range(REPS):
            t_ref[0:L, :] = t_ref[0:L, :] + x
        o_ref[:, :] = t_ref[0:L, :]
    t("aligned RMW t[0:24]+=x", run1(rmw_aligned, 56), a)

    # 3. unaligned VMEM RMW: t[i:i+24] += x with i cycling 0..7
    def rmw_unaligned(a_ref, o_ref, t_ref):
        x = a_ref[:, :]
        for r in range(REPS):
            i = r % 8
            t_ref[i:i + L, :] = t_ref[i:i + L, :] + x
        o_ref[:, :] = t_ref[0:L, :]
    t("unaligned RMW t[i:i+24]+=x", run1(rmw_unaligned, 56), a)

    # 4. sublane roll of (32, TB)
    def roll_chain(a_ref, o_ref):
        x = jnp.pad(a_ref[:, :], ((0, 8), (0, 0)))
        for r in range(REPS):
            x = pltpu.roll(x, 1, 0)
        o_ref[:, :] = x[:L]
    t("pltpu.roll((32,TB),1,axis=0)", run1(roll_chain), a)

    # 5. current Montgomery mul (from pallas_ec._KF), REPS dependent muls
    from constantine_tpu.named.precompute import get_curve
    from constantine_tpu.ops.pallas_ec import _KF
    F = get_curve("BLS12_381").fp
    p_limbs = tuple(int(v) for v in F.p)
    m0 = np.uint32(F.m0ninv)
    consts = np.zeros((2, L, 128), np.uint32)
    consts[0] = np.asarray(F.p, np.uint32)[:, None]
    consts[1] = np.asarray(F.one, np.uint32)[:, None]
    cj = jnp.asarray(consts)

    def mont_chain(a_ref, c_ref, o_ref, t_ref):
        kf = _KF(L, p_limbs, m0, c_ref[0, :, :1], c_ref[1, :, :1], t_ref)
        x = a_ref[:, :]
        for _ in range(REPS // 8):
            x = kf.mul(x, x)
        o_ref[:, :] = x

    def run_mont(body):
        fn = pl.pallas_call(
            body,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((L, TB), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((2, L, 128), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((L, TB), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, TB), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32)],
        )
        return jax.jit(fn)
    t("Montgomery mul (current _KF)", run_mont(mont_chain), a, cj,
      iters=REPS // 8)





def mont_mul_reg(L, p_limbs, m0, a, b, prot=None):
    """Register-window no-shift CIOS: accumulator as a (32, TB) jnp value.

    Requires L % 8 == 0 and L <= 24 (window covers 32 rows = L + 8).
    Rotations of b (and p) by r=0..8 make every accumulation add aligned;
    rows retire 8 at a time via a roll once their columns are finalized.
    """
    TBl = a.shape[1]
    G = L // 8
    bp = jnp.pad(b, ((0, 8), (0, 0)))
    brot = [bp] + [pltpu.roll(bp, r, 0) for r in range(1, 9)]
    if prot is None:
        pp = jnp.concatenate(
            [jnp.full((1, TBl), np.uint32(p_limbs[i])) for i in range(L)]
            + [jnp.zeros((8, TBl), jnp.uint32)], axis=0)
        prot = [pp] + [pltpu.roll(pp, r, 0) for r in range(1, 9)]
    acc = jnp.zeros((32, TBl), jnp.uint32)
    carry = jnp.zeros((1, TBl), jnp.uint32)
    zero8 = jnp.zeros((8, TBl), jnp.uint32)
    for q in range(G):
        for r in range(8):
            i = 8 * q + r
            ai = a[i:i + 1, :]
            p1 = ai * brot[r]
            p2 = ai * brot[r + 1]
            lo = p1 & MASK
            hi = p2 >> np.uint32(16)
            acc = acc + lo + hi
            cur = acc[r:r + 1, :] + carry
            m = (cur * m0) & MASK
            q1 = m * prot[r]
            q2 = m * prot[r + 1]
            qlo = q1 & MASK
            qhi = q2 >> np.uint32(16)
            acc = acc + qlo + qhi
            carry = (cur + qlo[r:r + 1, :]) >> np.uint32(16)
        # rows 8q..8q+7 finalized (only their carry survives): drop them
        acc = pltpu.roll(acc, 24, 0)
        acc = jnp.concatenate([acc[:24], zero8], axis=0)
    # After the G roll-and-zero iterations the live accumulator window
    # [8G, 8G+32) has been rotated down to rows [0, 32); rows [0, L) hold
    # the (unnormalized) Montgomery result. Verified against host math by
    # extra() below.
    res = acc[:L]
    rows = [res[i, :] + (carry[0] if i == 0 else 0) for i in range(L)]
    for i in range(L - 1):
        c = rows[i] >> np.uint32(16)
        rows[i] = rows[i] & MASK
        rows[i + 1] = rows[i + 1] + c
    hi_bit = rows[L - 1] >> np.uint32(16)
    rows[L - 1] = rows[L - 1] & MASK
    diff = []
    c = jnp.ones_like(rows[0])
    for i in range(L):
        s = rows[i] + (MASK - np.uint32(p_limbs[i])) + c
        diff.append(s & MASK)
        c = s >> np.uint32(16)
    take = (hi_bit > 0) | (c == 1)
    return jnp.stack([jnp.where(take, d, r0) for d, r0 in zip(diff, rows)], 0)


def extra():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    from constantine_tpu.named.precompute import get_curve
    F = get_curve("BLS12_381").fp
    p_limbs = tuple(int(v) for v in F.p)
    m0 = np.uint32(F.m0ninv)

    a = jnp.asarray(rng.integers(0, 2**16, size=(L, TB), dtype=np.uint32))

    def mont2_chain(a_ref, o_ref):
        x = a_ref[:, :]
        for _ in range(REPS // 8):
            x = mont_mul_reg(L, p_limbs, m0, x, x)
        o_ref[:, :] = x
    t("Montgomery mul (register window)", run1(mont2_chain), a,
      iters=REPS // 8)

    # correctness check vs host math
    av = rng.integers(0, 2**16, size=(L, 8), dtype=np.uint32)
    bv = rng.integers(0, 2**16, size=(L, 8), dtype=np.uint32)
    def one(a_ref, b_ref, o_ref):
        o_ref[:, :] = mont_mul_reg(L, p_limbs, m0, a_ref[:, :], b_ref[:, :])
    fn = pl.pallas_call(
        one, grid=(1,),
        in_specs=[pl.BlockSpec((L, TB), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((L, TB), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, TB), jnp.uint32),
    )
    aw = np.zeros((L, TB), np.uint32); aw[:, :8] = av
    bw = np.zeros((L, TB), np.uint32); bw[:, :8] = bv
    out = np.asarray(jax.jit(fn)(jnp.asarray(aw), jnp.asarray(bw)))[:, :8]
    R_inv = pow(1 << (16 * L), -1, F.modulus)
    ok = True
    for j in range(8):
        ai = sum(int(av[i, j]) << (16 * i) for i in range(L))
        bi = sum(int(bv[i, j]) << (16 * i) for i in range(L))
        want = (ai * bi * R_inv) % F.modulus
        got = sum(int(out[i, j]) << (16 * i) for i in range(L))
        if got != want and got != want + F.modulus:
            ok = False
            print("MISMATCH lane", j, hex(got), hex(want))
    print("correctness:", "OK" if ok else "FAIL")





def mont_mul_v2(L, p_limbs, m0, a, b):
    """V2: hi parts via roll of the same product; b/p rolled incrementally.
    Live state: acc(32), bcur(32), pcur(32), a(24) + temps."""
    TBl = a.shape[1]
    G = L // 8
    one16 = np.uint32(16)
    bcur = jnp.pad(b, ((0, 8), (0, 0)))
    pcur = jnp.concatenate(
        [jnp.full((1, TBl), np.uint32(p_limbs[i])) for i in range(L)]
        + [jnp.zeros((8, TBl), jnp.uint32)], axis=0)
    acc = jnp.zeros((32, TBl), jnp.uint32)
    carry = jnp.zeros((1, TBl), jnp.uint32)
    zero8 = jnp.zeros((8, TBl), jnp.uint32)
    for q in range(G):
        for r in range(8):
            i = 8 * q + r
            ai = a[i:i + 1, :]
            p1 = ai * bcur
            acc = acc + (p1 & MASK) + pltpu.roll(p1 >> one16, 1, 0)
            cur = acc[r:r + 1, :] + carry
            m = (cur * m0) & MASK
            q1 = m * pcur
            qlo = q1 & MASK
            acc = acc + qlo + pltpu.roll(q1 >> one16, 1, 0)
            carry = (cur + qlo[r:r + 1, :]) >> one16
            if r < 7:
                bcur = pltpu.roll(bcur, 1, 0)
                pcur = pltpu.roll(pcur, 1, 0)
            elif q < G - 1:
                bcur = pltpu.roll(bcur, 25, 0)
                pcur = pltpu.roll(pcur, 25, 0)
        acc = pltpu.roll(acc, 24, 0)
        acc = jnp.concatenate([acc[:24], zero8], axis=0)
    res = acc[:L]
    rows = [res[i, :] + (carry[0] if i == 0 else 0) for i in range(L)]
    for i in range(L - 1):
        c = rows[i] >> one16
        rows[i] = rows[i] & MASK
        rows[i + 1] = rows[i + 1] + c
    hi_bit = rows[L - 1] >> one16
    rows[L - 1] = rows[L - 1] & MASK
    diff = []
    c = jnp.ones_like(rows[0])
    for i in range(L):
        s = rows[i] + (MASK - np.uint32(p_limbs[i])) + c
        diff.append(s & MASK)
        c = s >> one16
    take = (hi_bit > 0) | (c == 1)
    return jnp.stack([jnp.where(take, d, r0) for d, r0 in zip(diff, rows)], 0)


def extra2():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    from constantine_tpu.named.precompute import get_curve
    F = get_curve("BLS12_381").fp
    p_limbs = tuple(int(v) for v in F.p)
    m0 = np.uint32(F.m0ninv)

    for tb in (512, 256):
        a = jnp.asarray(rng.integers(0, 2**16, size=(L, tb), dtype=np.uint32))

        def chain(fnm):
            def body(a_ref, o_ref):
                x = a_ref[:, :]
                for _ in range(REPS // 8):
                    x = fnm(L, p_limbs, m0, x, x)
                o_ref[:, :] = x
            return body

        def run_tb(body):
            fn = pl.pallas_call(
                body, grid=(GRID,),
                in_specs=[pl.BlockSpec((L, tb), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((L, tb), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((L, tb), jnp.uint32),
            )
            return jax.jit(fn)
        gtb = TB / tb
        out = run_tb(chain(mont_mul_v2))(a)
        sync(out)
        import time as _t
        ts = []
        for _ in range(3):
            t0 = _t.time()
            for _ in range(4):
                out = run_tb(chain(mont_mul_v2))(a)
            sync(out)
            ts.append((_t.time() - t0) / 4)
        dt = min(ts) / (REPS // 8 * GRID)
        print(f"mont_v2 TB={tb}: {dt*1e9:.0f} ns/mul ({dt*1e9/tb*1000:.1f} ps/lane)")

    # correctness
    av = rng.integers(0, 2**16, size=(L, 8), dtype=np.uint32)
    bv = rng.integers(0, 2**16, size=(L, 8), dtype=np.uint32)
    def one(a_ref, b_ref, o_ref):
        o_ref[:, :] = mont_mul_v2(L, p_limbs, m0, a_ref[:, :], b_ref[:, :])
    fn = pl.pallas_call(
        one, grid=(1,),
        in_specs=[pl.BlockSpec((L, TB), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((L, TB), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, TB), jnp.uint32),
    )
    aw = np.zeros((L, TB), np.uint32); aw[:, :8] = av
    bw = np.zeros((L, TB), np.uint32); bw[:, :8] = bv
    out = np.asarray(jax.jit(fn)(jnp.asarray(aw), jnp.asarray(bw)))[:, :8]
    P = sum(int(v) << (16 * i) for i, v in enumerate(p_limbs))
    R_inv = pow(1 << (16 * L), -1, P)
    ok = True
    for j in range(8):
        ai = sum(int(av[i, j]) << (16 * i) for i in range(L))
        bi = sum(int(bv[i, j]) << (16 * i) for i in range(L))
        want = (ai * bi * R_inv) % P
        got = sum(int(out[i, j]) << (16 * i) for i in range(L))
        if got != want and got != want + P:
            ok = False
            print("MISMATCH lane", j, hex(got), hex(want))
    print("correctness:", "OK" if ok else "FAIL")


if __name__ == "__main__":
    if os.environ.get("EXTRA2"):
        extra2()
    elif os.environ.get("EXTRA"):
        extra()
    else:
        main()
