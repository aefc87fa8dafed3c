"""Constant-time audit of the secret-handling device paths.

The TPU analogue of the reference's `{.tags:[VarTime].}` static effect
audit (ARCHITECTURE.md:96-122): each secret-consuming kernel is traced
with abstract inputs — success PROVES its op schedule is independent of
input values (no data-dependent host branching anywhere inside), so on
the SPMD backend every lane runs the identical instruction sequence for
any secret. See constantine_tpu/utils/audit.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from constantine_tpu.named.precompute import get_curve
from constantine_tpu.utils.audit import (assert_constant_time,
                                         ConstantTimeViolation, vartime,
                                         vartime_registry)


@pytest.fixture(scope="module")
def ctx():
    return get_curve("BLS12_381")


def test_field_ops_constant_time(ctx):
    F = ctx.fp
    a = jnp.zeros((4, F.L), jnp.uint32)
    b = jnp.zeros((4, F.L), jnp.uint32)
    assert_constant_time(F.mul, a, b)
    assert_constant_time(F.add, a, b)
    assert_constant_time(F.inv, a)           # Fermat chain: fixed schedule
    assert_constant_time(F.batch_inv, a)


def test_scalar_mul_ct_path_constant_time(ctx):
    """The CT fixed-window ladder (scalar_mul.py:101) — the analogue of
    the reference's scalarMul CT dispatcher (ec_scalar_mul.nim:438)."""
    from constantine_tpu.ops.scalar_mul import scalar_mul_windowed
    k = jnp.zeros((3, ctx.fr.L), jnp.uint32)
    P = ctx.g1.from_affine(tuple(
        jnp.broadcast_to(g, (3,) + g.shape[1:]) for g in ctx.g1_gen))

    def f(kl, Px, Py, Pz):
        return scalar_mul_windowed(ctx.g1, kl, (Px, Py, Pz))
    assert_constant_time(f, k, *P)


def test_glv_decompose_constant_time(ctx):
    """GLV split consumes the secret scalar (split_scalars.nim:95)."""
    from constantine_tpu.ops.glv import get_glv
    glv = get_glv("BLS12_381")
    k = jnp.zeros((5, ctx.fr.L), jnp.uint32)
    assert_constant_time(glv.decompose, k)


def test_gt_exp_constant_time(ctx):
    from constantine_tpu.ops.gt import get_gt
    gt = get_gt("BLS12_381")
    k = jnp.zeros((2, ctx.fr.L), jnp.uint32)
    f = gt.fp12.broadcast_one((2,))

    def e(kl, fv):
        return gt.exp(kl, fv, exp_bits=255)
    assert_constant_time(e, k, f)


def test_violation_is_caught():
    """A host branch on an input value must FAIL the audit — this is the
    property that makes a passing audit meaningful."""
    def leaky(x):
        if np.asarray(x).sum() > 0:      # data-dependent host branch
            return x + 1
        return x

    with pytest.raises(ConstantTimeViolation):
        assert_constant_time(leaky, jnp.ones((3,), jnp.uint32))


def test_vartime_registry_enumerable():
    @vartime(reason="test fixture")
    def public_only(x):
        return int(x) + 1

    reg = vartime_registry()
    key = [k for k in reg if "public_only" in k]
    assert key and reg[key[0]].__vartime_reason__ == "test fixture"
    assert public_only.__vartime__
