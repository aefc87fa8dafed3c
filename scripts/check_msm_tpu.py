"""Differential check: Pallas msm_tpu vs host-integer reference (scratch tool)."""
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.ops.msm import msm
from constantine_tpu.utils import refmath as rm


def main():
    n = int(os.environ.get("N", 512))
    bits = int(os.environ.get("BITS", 64))
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    rng = np.random.default_rng(11)
    ks = [int(k) for k in rng.integers(1, 2**62, size=n)]
    pts = [rm.ec_mul(k, ctx.g, 0, ctx.p) for k in ks]
    px = jnp.asarray(F.encode([p[0] for p in pts]))
    py = jnp.asarray(F.encode([p[1] for p in pts]))
    scalars = [int(s) % (1 << bits)
               for s in rng.integers(0, 2**62, size=n)]
    scalars[0] = 0
    scalars[1] = 1
    sl = jnp.asarray(ctx.scalars_to_limbs(scalars))

    got = msm(ctx.g1, (px, py), sl, scalar_bits=bits, use_pallas=True)
    # to affine & decode
    (ax, ay), inf = ctx.g1.to_affine(tuple(g[None] for g in got))
    gx = F.decode(np.asarray(ax))[0]
    gy = F.decode(np.asarray(ay))[0]

    want = (0, 0)
    acc = None
    for k, p in zip(scalars, pts):
        q = rm.ec_mul(k % ctx.r, p, 0, ctx.p)
        if q is None or q == (None, None):
            continue
        acc = q if acc is None else rm.ec_add(acc, q, 0, ctx.p)
    print("pallas:", hex(gx)[:24], hex(gy)[:24])
    print("ref:   ", hex(acc[0])[:24], hex(acc[1])[:24])
    assert gx == acc[0] and gy == acc[1], "MISMATCH"
    print("OK")


if __name__ == "__main__":
    main()
