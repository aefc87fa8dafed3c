"""Differential check: Pallas pairing kernels vs the (vector-validated)
XLA tower path, on the real chip. B small on purpose."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from constantine_tpu.ops.pairing import get_pairing
from constantine_tpu.ops.pallas_pairing import get_pallas_pairing
from constantine_tpu.utils import refmath as rm


def main():
    B = int(os.environ.get("B", 4))
    pr = get_pairing("BLS12_381")
    pp = get_pallas_pairing()
    ctx = pr.ctx
    rng = np.random.default_rng(9)
    ks = [int(k) for k in rng.integers(2, 2**60, size=B)]
    g1 = [rm.ec_mul(k, ctx.g, 0, ctx.p) for k in ks]
    px = jnp.asarray(ctx.fp.encode([p[0] for p in g1]))
    py = jnp.asarray(ctx.fp.encode([p[1] for p in g1]))
    nrr = ctx.params.fp2_nonresidue
    g2 = [rm.ec2_mul(int(k), ctx.g2_aff, (0, 0), nrr, ctx.p)
          for k in rng.integers(2, 2**60, size=B)]
    qx = jnp.asarray(np.stack([pr.fp2.encode(list(q[0])) for q in g2]))
    qy = jnp.asarray(np.stack([pr.fp2.encode(list(q[1])) for q in g2]))

    t0 = time.time()
    want_m = np.asarray(jax.device_get(pr.miller_loop((px, py), (qx, qy))))
    print(f"xla miller: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    got_m = np.asarray(jax.device_get(
        jax.jit(pp.miller)((px, py), (qx, qy))))
    print(f"pallas miller (incl compile): {time.time()-t0:.1f}s", flush=True)
    if (got_m == want_m).all():
        print("MILLER OK")
    else:
        bad = np.argwhere((got_m != want_m).any(axis=(1, 2)))
        print(f"MILLER MISMATCH lanes {bad.ravel()[:8]}")
        print("want", want_m[0, :2])
        print("got ", got_m[0, :2])
        return 1

    t0 = time.time()
    want_f = np.asarray(jax.device_get(pr.final_exp(jnp.asarray(want_m))))
    print(f"xla final_exp: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    got_f = np.asarray(jax.device_get(
        jax.jit(pp.final_exp)(jnp.asarray(want_m))))
    print(f"pallas final_exp (incl compile): {time.time()-t0:.1f}s",
          flush=True)
    if (got_f == want_f).all():
        print("FINAL_EXP OK")
        return 0
    print("FINAL_EXP MISMATCH")
    print("want", want_f[0, :2])
    print("got ", got_f[0, :2])
    return 1


if __name__ == "__main__":
    sys.exit(main())
