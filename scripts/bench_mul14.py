"""Microbenchmark: 14-bit-digit SOS Montgomery mul vs the current 16-bit
no-shift CIOS (_KF.mul), measured with readback sync on the real chip.

Idea: with 14-bit digits, full 28-bit products can be accumulated ~13 deep
in u32 columns before a normalization pass, cutting the per-MAC op count
from ~5 (mul, mask, shift, 2 slice-adds) to ~2.2 (mul, slice-add, amortized
norm). The Montgomery radix moves to 2^14 (R' = 2^392); pre-shifting one
input by 2^(392-384) keeps the external R = 2^384 domain contract, so the
kernel is a drop-in for _KF.mul.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.pallas_ec import get_pallas_ec, _KF, _CPARAMS

W16 = 16
M16 = np.uint32(0xFFFF)
D = 14
MD = np.uint32((1 << D) - 1)


def sync(o):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0].ravel()[:1]))


def timeit(name, f, *args, reps=3, pipeline=4, per=1):
    out = f(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(pipeline):
            out = f(*args)
        sync(out)
        ts.append((time.time() - t0) / pipeline)
    dt = min(ts)
    print(f"{name:36s} {dt*1e3:9.3f} ms  {dt/per*1e9:7.3f} ns/lane-mul",
          flush=True)
    return out


class Mul14:
    """14-bit SOS Montgomery mul over (L16, TB) 16-bit-row blocks."""

    def __init__(self, F):
        self.L16 = F.L                     # 24 for BLS12-381
        self.bits = 16 * F.L               # R = 2^384
        p_int = 0
        for i, v in enumerate(np.asarray(F.p, np.uint32)):
            p_int |= int(v) << (16 * i)
        self.p_int = p_int
        self.LD = -(-(self.bits + 8) // D)          # 28: R' = 2^392
        self.shift = D * self.LD - self.bits        # 8
        self.p14 = [(p_int >> (D * i)) & int(MD) for i in range(self.LD)]
        self.m0 = np.uint32(pow(-p_int, -1, 1 << D))
        self.p16 = [int(v) for v in np.asarray(F.p, np.uint32)]

    def redigit_to14(self, rows16, shift):
        """(L16, TB) 16-bit rows -> list of LD (1, TB) 14-bit rows of
        value << shift. Static row/offset arithmetic, ~4 ops per row."""
        out = []
        for j in range(self.LD):
            lo_bit = D * j - shift
            if lo_bit < 0:
                v = (rows16[0:1] << np.uint32(-lo_bit)) & MD
            else:
                s, o = divmod(lo_bit, 16)
                if s >= self.L16:
                    v = jnp.zeros_like(rows16[0:1])
                else:
                    v = rows16[s:s + 1] >> np.uint32(o)
                    if o + D > 16 and s + 1 < self.L16:
                        v = v | (rows16[s + 1:s + 2] << np.uint32(16 - o))
                    v = v & MD
            out.append(v)
        return jnp.concatenate(out, axis=0)          # (LD, TB)

    def redigit_to16(self, rows14):
        """list/(LD,TB) canonical 14-bit rows -> (L16, TB) 16-bit rows."""
        out = []
        for k in range(self.L16):
            lo_bit = 16 * k
            s, o = divmod(lo_bit, D)
            v = rows14[s:s + 1] >> np.uint32(o)
            used = D - o
            while used < 16 and s + 1 < self.LD:
                s += 1
                v = v | (rows14[s:s + 1] << np.uint32(used))
                used += D
            out.append(v & M16)
        return jnp.concatenate(out, axis=0)

    def mul_body(self, a, b, t_ref, p14c):
        """Kernel-side: a, b (L16, TB) 16-bit rows -> (L16, TB).
        t_ref: VMEM scratch (2*LD+2, TB) u32; p14c (LD, 1) from an input ref."""
        LD = self.LD
        TB = a.shape[1]
        a14 = self.redigit_to14(a, self.shift)       # value(a) << 8
        b14 = self.redigit_to14(b, 0)
        t_ref[:, :] = jnp.zeros((2 * LD + 2, TB), jnp.uint32)

        def norm(lo, hi):
            # propagate >>D carries one step up within [lo, hi)
            blk = t_ref[lo:hi, :]
            t_ref[lo:hi, :] = blk & MD
            t_ref[lo + 1:hi + 1, :] = t_ref[lo + 1:hi + 1, :] + (blk >> D)

        # ---- a*b accumulation (full products, norm every 12 steps) ----
        for i in range(LD):
            prod = a14[i:i + 1, :] * b14             # (LD, TB) 14x14 -> 28
            t_ref[i:i + LD, :] = t_ref[i:i + LD, :] + prod
            if i % 12 == 11:
                norm(i - 11, i + LD)
        norm(0, 2 * LD)                              # leave cols < 2^15

        # ---- Montgomery reduction radix 2^14 ----
        for i in range(LD):
            m = (t_ref[i:i + 1, :] * self.m0) & MD   # (1, TB)
            prod = m * p14c                          # (LD, TB)
            t_ref[i:i + LD, :] = t_ref[i:i + LD, :] + prod
            # col i now ≡ 0 mod 2^14; push its carry up
            t_ref[i + 1:i + 2, :] = t_ref[i + 1:i + 2, :] \
                + (t_ref[i:i + 1, :] >> D)
            if i % 12 == 11:
                norm(i + 1, i + LD)
        # ---- final ripple of the high half to canonical 14-bit ----
        rows = [t_ref[LD + j, :] for j in range(LD)]
        for j in range(LD - 1):
            c = rows[j] >> D
            rows[j] = rows[j] & MD
            rows[j + 1] = rows[j + 1] + c
        res14 = jnp.stack(rows, axis=0)              # (LD, TB) canonical
        out16 = self.redigit_to16(res14)
        # conditional subtract p (16-bit rows)
        d = []
        c = jnp.ones((TB,), jnp.uint32)
        ge = jnp.ones((TB,), jnp.bool_)
        for k in range(self.L16 - 1, -1, -1):
            pass
        # compute out - p with borrow; take if no borrow
        c = jnp.ones((TB,), jnp.uint32)
        for k in range(self.L16):
            v = out16[k, :] + (M16 - np.uint32(self.p16[k])) + c
            d.append(v & M16)
            c = v >> W16
        take = c == 1
        return jnp.stack([jnp.where(take, x, y)
                          for x, y in zip(d, [out16[k, :] for k in range(self.L16)])], 0)


def main():
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    L = F.L
    pec = get_pallas_ec(F, 512)
    m14 = Mul14(F)
    TB = 512
    N = 1 << 19
    INNER = 4
    rng = np.random.default_rng(0)
    # random field elements < p as 16-bit rows
    p_int = m14.p_int
    a_np = rng.integers(0, 1 << 16, size=(L, N)).astype(np.uint32)
    b_np = rng.integers(0, 1 << 16, size=(L, N)).astype(np.uint32)
    # force valid field elements: mod p via host on a few lanes for checks
    import random
    hrng = random.Random(7)
    a_int = [hrng.randrange(p_int) for _ in range(8)]
    b_int = [hrng.randrange(p_int) for _ in range(8)]
    for lane in range(8):
        for r in range(L):
            a_np[r, lane] = (int(a_int[lane]) >> (16 * r)) & 0xFFFF
            b_np[r, lane] = (int(b_int[lane]) >> (16 * r)) & 0xFFFF
    # clamp all other lanes to < p by zeroing the top row (safe: < 2^368)
    a_np[L - 1, 8:] = 0
    b_np[L - 1, 8:] = 0
    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)

    # --- current 16-bit CIOS kernel (INNER chained muls) ---
    def kern16(a_ref, b_ref, c_ref, o_ref, t_ref):
        kf = pec._kf(c_ref, t_ref)
        acc = a_ref[:, :]
        for _ in range(INNER):
            acc = kf.mul(acc, b_ref[:, :])
        o_ref[:, :] = acc

    f16 = jax.jit(pl.pallas_call(
        kern16, grid=(N // TB,),
        in_specs=[pl.BlockSpec((L, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((2, L, 128), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((2 * L + 1, TB), jnp.uint32)],
        compiler_params=_CPARAMS,
    ))

    # --- 14-bit SOS kernel ---
    def kern14(a_ref, b_ref, p_ref, o_ref, t_ref):
        acc = a_ref[:, :]
        p14c = p_ref[:, :1]
        for _ in range(INNER):
            acc = m14.mul_body(acc, b_ref[:, :], t_ref, p14c)
        o_ref[:, :] = acc

    f14 = jax.jit(pl.pallas_call(
        kern14, grid=(N // TB,),
        in_specs=[pl.BlockSpec((L, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((m14.LD, 128), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((L, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((2 * m14.LD + 2, TB), jnp.uint32)],
        compiler_params=_CPARAMS,
    ))

    out16 = f16(a, b, pec._consts)
    sync(out16)
    p14_arr = jnp.asarray(np.broadcast_to(
        np.array(m14.p14, np.uint32)[:, None], (m14.LD, 128)).copy())
    out14 = f14(a, b, p14_arr)
    sync(out14)
    # correctness on the 8 crafted lanes
    got16 = np.asarray(jax.device_get(out16[:, :8]))
    got14 = np.asarray(jax.device_get(out14[:, :8]))
    Rinv = pow(1 << 384, -1, p_int)
    ok = True
    for lane in range(8):
        x = a_int[lane]
        for _ in range(INNER):
            x = x * b_int[lane] % p_int * Rinv % p_int
        want = x
        g16 = sum(int(got16[r, lane]) << (16 * r) for r in range(L))
        g14 = sum(int(got14[r, lane]) << (16 * r) for r in range(L))
        if g16 != want:
            print(f"lane {lane}: kern16 MISMATCH")
            ok = False
        if g14 != want:
            print(f"lane {lane}: kern14 MISMATCH (got {hex(g14)[:20]}.. "
                  f"want {hex(want)[:20]}..)")
            ok = False
    print("correct:", ok)

    per = N * INNER
    timeit("16-bit CIOS (current)", f16, a, b, pec._consts, per=per)
    timeit("14-bit SOS (new)", f14, a, b, p14_arr, per=per)


if __name__ == "__main__":
    main()
