"""Endomorphism-accelerated subgroup membership checks, batched.

Re-design of the reference's per-curve subgroup machinery
(constantine/named/zoo_subgroups.nim:34 dispatch;
constantine/named/constants/bls12_381_subgroups.nim:170-228) for SPMD:
Scott's membership tests (eprint.iacr.org/2021/1130, "A note on group
membership tests for G1, G2 and GT on BLS pairing-friendly curves"):

  G1 (BLS12):  P in G1  iff  phi(P) == [-u^2]P
               (phi(x, y) = (beta*x, y), the GLV endomorphism; computed
                as two |u|-bit ladders: t = [u]P, then [-u]t)
  G2 (BLS12):  Q in G2  iff  psi(Q) == [u]Q
               (psi = untwist-Frobenius-twist endomorphism)

For BLS12-381, |u| is 64 bits with Hamming weight 6, so the G1 check costs
~128 batched doublings + ~12 additions vs ~255 doublings + ~127 additions
for the generic [r]P ladder the serializers previously used. Curves
without a proven fast test fall back to the generic ladder (still batched
on device — no host bigint ladders).

The scalar here is PUBLIC (a curve constant), so a host-side binary
expansion with data-independent structure is exactly as constant-time as
the reference's hardcoded addition chains (pow_bls12_381_abs_x).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _ladder_const(group, P, k: int):
    """[k]P for a host-known k >= 0, batched double-and-add (MSB first).

    Long ladders run as a lax.scan over the bit array: the unrolled form
    compiled ~2 complete group ops PER BIT into the XLA program (~128
    point ops ~ hundreds of kHLO for the 127-bit G1 check) — the single
    biggest compile-time term in the fused verify program and the
    decompress tests. The scalar is PUBLIC (a curve constant), so the
    masked-add scan leaks nothing new."""
    if k == 0:
        batch = P[0].shape[:-1] if not hasattr(group.F, "deg") \
            else P[0].shape[:-2]
        return group.infinity(batch)
    bits = bin(k)[3:]                      # skip the leading 1
    # the scan form segfaults the XLA-CPU LLVM backend on this box
    # (reproduced in the Deneb verify vectors); CPU keeps the unrolled
    # r4-validated lowering, accelerators get the compact scan
    if len(bits) <= 8 or jax.default_backend() == "cpu":
        acc = P
        for b in bits:
            acc = group.double(acc)
            if b == "1":
                acc = group.add(acc, P)
        return acc
    bit_arr = jnp.asarray(np.array([int(b) for b in bits], np.int32))
    batch = P[0].shape[:-1] if not hasattr(group.F, "deg") \
        else P[0].shape[:-2]

    def body(acc, bit):
        acc = group.double(acc)
        added = group.add(acc, P)
        take = (bit == 1) & jnp.ones(batch, bool)
        return group.select(take, added, acc), None

    # bits already excludes the implicit leading 1 (acc starts at [1]P)
    acc, _ = jax.lax.scan(body, P, bit_arr)
    return acc


def _jac_eq(group, P, Q):
    """Batched Jacobian equality: cross-multiplied coordinates, plus
    matching point-at-infinity states."""
    F = group.F
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = F.square(Z1)
    Z2Z2 = F.square(Z2)
    ex = F.is_zero(F.sub(F.mul(X1, Z2Z2), F.mul(X2, Z1Z1)))
    ey = F.is_zero(F.sub(F.mul(Y1, F.mul(Z2, Z2Z2)),
                         F.mul(Y2, F.mul(Z1, Z1Z1))))
    i1 = group.is_inf(P)
    i2 = group.is_inf(Q)
    return (i1 & i2) | ((~i1) & (~i2) & ex & ey)


@functools.lru_cache(maxsize=None)
def _beta_mont(curve_name: str):
    from .glv import get_glv
    return get_glv(curve_name).beta_mont


def is_in_subgroup_g1(ctx, P):
    """Batched G1 subgroup check on Jacobian points. Assumes on-curve.

    BLS12 family: phi(P) == [-u^2]P (Scott); otherwise generic [r]P == inf.
    """
    group = ctx.g1
    if ctx.params.family == "bls12" and ctx.params.x_param is not None:
        try:
            beta = _beta_mont(ctx.name)
        except Exception:
            beta = None
        if beta is not None:
            u = ctx.params.x_param
            # t = [u]P then [-u]t = [-u^2]P (sign bookkeeping on host)
            t = _ladder_const(group, P, abs(u))
            if u < 0:
                t = group.neg(t)
            t = _ladder_const(group, t, abs(u))
            t = group.neg(t) if u >= 0 else t      # overall [-u^2]P
            X, Y, Z = P
            bb = jnp.broadcast_to(jnp.asarray(beta), X.shape)
            phi = (ctx.fp.mul(X, bb), Y, Z)
            return _jac_eq(group, phi, t)
    return group.is_inf(_ladder_const(group, P, ctx.r))


def is_in_subgroup_g2(ctx, Q):
    """Batched G2 subgroup check on Jacobian points. Assumes on-curve.

    BLS12 family: psi(Q) == [u]Q (Scott); otherwise generic [r]Q == inf.
    psi reuses the untwist-Frobenius-twist map of the hash-to-curve
    cofactor machinery (models/hash_to_curve.py).
    """
    group = ctx.g2
    if ctx.params.family == "bls12" and ctx.params.x_param is not None \
            and ctx.name == "BLS12_381":
        from ..models.hash_to_curve import get_h2c
        h2c = get_h2c()
        u = ctx.params.x_param
        t = _ladder_const(group, Q, abs(u))
        if u < 0:
            t = group.neg(t)
        return _jac_eq(group, h2c.psi(Q), t)
    return group.is_inf(_ladder_const(group, Q, ctx.r))
