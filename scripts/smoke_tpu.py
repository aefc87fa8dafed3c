"""TPU smoke test: validates the default-on Pallas field-mul routing and
the main compute paths on the real chip (tests/ run on the CPU backend, so
this is the device-side correctness gate)."""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    print("devices:", jax.devices(), flush=True)
    from constantine_tpu.named.precompute import get_curve
    ctx = get_curve("BLS12_381")
    F = ctx.fp
    assert hasattr(F, "_pallas"), "Pallas mul not active by default on TPU"
    rng = np.random.default_rng(0)

    # field mul vs host ints, several shapes incl. tiny (XLA fallback) and
    # broadcast
    for n in (3, 7, 600):
        av = [int.from_bytes(rng.bytes(47), "big") % ctx.p for _ in range(n)]
        bv = [int.from_bytes(rng.bytes(47), "big") % ctx.p for _ in range(n)]
        a = jnp.asarray(F.encode(av))
        b = jnp.asarray(F.encode(bv))
        got = F.decode(F.mul(a, b))
        want = [x * y % ctx.p for x, y in zip(av, bv)]
        assert got == want, f"mul mismatch at n={n}"
        got1 = F.decode(F.mul(a, b[:1]))
        want1 = [x * bv[0] % ctx.p for x in av]
        assert got1 == want1, f"broadcast mul mismatch at n={n}"
    print("field mul OK", flush=True)

    # tower mul (picks up Pallas via F.mul)
    fp2 = ctx.fp2 if hasattr(ctx, "fp2") else None
    from constantine_tpu.ops.pairing import get_pairing
    pr = get_pairing("BLS12_381")
    t0 = time.time()
    from constantine_tpu.utils import refmath as rm
    k1, k2 = 5, 7
    g1 = rm.ec_mul(k1, ctx.g, 0, ctx.p)
    px = jnp.asarray(ctx.fp.encode([g1[0]]))
    py = jnp.asarray(ctx.fp.encode([g1[1]]))
    nrr = ctx.params.fp2_nonresidue
    g2 = rm.ec2_mul(k2, ctx.g2_aff, (0, 0), nrr, ctx.p)
    qx = jnp.asarray(np.stack([pr.fp2.encode(list(g2[0]))]))
    qy = jnp.asarray(np.stack([pr.fp2.encode(list(g2[1]))]))
    e_ab = pr.pairing((px, py), (qx, qy))
    # e([5]G1,[7]G2) == e(G1,G2)^35
    p1 = jnp.asarray(ctx.fp.encode([ctx.g[0]]))
    p2 = jnp.asarray(ctx.fp.encode([ctx.g[1]]))
    r1 = jnp.asarray(np.stack([pr.fp2.encode(list(ctx.g2_aff[0]))]))
    r2 = jnp.asarray(np.stack([pr.fp2.encode(list(ctx.g2_aff[1]))]))
    e_g = pr.pairing((p1, p2), (r1, r2))
    from constantine_tpu.ops.gt import get_gt
    gt = get_gt("BLS12_381")
    e35 = gt.exp(jnp.asarray([[35] + [0] * (ctx.fr.L - 1)], np.uint32),
                 e_g, exp_bits=6)
    ok = bool(np.asarray(jax.device_get(pr.fp12.eq(e_ab, e35))).all())
    assert ok, "pairing bilinearity FAILED on device"
    print(f"pairing bilinearity OK ({time.time()-t0:.1f}s)", flush=True)
    print("SMOKE PASS")


if __name__ == "__main__":
    main()
