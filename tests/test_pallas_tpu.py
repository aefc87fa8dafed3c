"""Pallas kernel tests — require a real accelerator backend.

The CPU test run (conftest forces jax_platforms=cpu) skips these: the
Pallas interpreter needs ~minutes per fused EC op, so kernel coverage
comes from this file on TPU plus the driver's bench run. The XLA MSM path
(ops/msm.py) is covered on CPU by test_msm.py; both paths implement the
same contract, so the cross-check below is the differential test.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="Pallas kernels need a TPU backend (interpreter too slow)")


@pytest.fixture(scope="module")
def ctx():
    from constantine_tpu.named.precompute import get_curve
    return get_curve("BLS12_381")


def test_msm_pallas_vs_xla(ctx):
    import functools
    from constantine_tpu.ops.msm import msm
    from constantine_tpu.utils import refmath as rm
    F = ctx.fp
    rng = np.random.default_rng(7)
    n = 256
    ks = [int(k) for k in rng.integers(1, 2**20, size=n)]
    pts = [rm.ec_mul(k, ctx.g, 0, ctx.p) for k in ks]
    px = jnp.asarray(F.encode([p[0] for p in pts]))
    py = jnp.asarray(F.encode([p[1] for p in pts]))
    scalars = [int(s) for s in rng.integers(0, 2**40, size=n)]
    scalars[0] = 0
    sl = jnp.asarray(ctx.scalars_to_limbs(scalars))
    mf = jax.jit(functools.partial(msm, ctx.g1),
                 static_argnames=("c", "scalar_bits", "use_pallas"))
    got_pallas = mf((px, py), sl, c=8, scalar_bits=41, use_pallas=True)
    got_xla = mf((px, py), sl, c=8, scalar_bits=41, use_pallas=False)
    (gx, gy), _ = ctx.g1.to_affine(tuple(t[None] for t in got_pallas))
    (ex, ey), _ = ctx.g1.to_affine(tuple(t[None] for t in got_xla))
    assert F.decode(gx) == F.decode(ex)
    assert F.decode(gy) == F.decode(ey)
    exp = None
    for k, pt in zip(scalars, pts):
        exp = rm.ec_add(exp, rm.ec_mul(k, pt, 0, ctx.p), 0, ctx.p)
    assert (F.decode(gx)[0], F.decode(gy)[0]) == exp


def test_msm_pallas_duplicate_points(ctx):
    """Duplicate points + equal scalars force the degenerate doubling path
    (the @pl.when-gated branch of the complete group law)."""
    import functools
    from constantine_tpu.ops.msm import msm
    from constantine_tpu.utils import refmath as rm
    F = ctx.fp
    P = rm.ec_mul(987654321, ctx.g, 0, ctx.p)
    n = 64
    px = jnp.asarray(F.encode([P[0]] * n))
    py = jnp.asarray(F.encode([P[1]] * n))
    sl = jnp.asarray(ctx.scalars_to_limbs([13] * n))
    mf = jax.jit(functools.partial(msm, ctx.g1),
                 static_argnames=("c", "scalar_bits", "use_pallas"))
    got = mf((px, py), sl, c=6, scalar_bits=8, use_pallas=True)
    (gx, gy), _ = ctx.g1.to_affine(tuple(t[None] for t in got))
    exp = rm.ec_mul(13 * n, P, 0, ctx.p)
    assert (F.decode(gx)[0], F.decode(gy)[0]) == exp
