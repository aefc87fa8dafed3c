"""KZG verification pairing equations.

kzg_verify (commitments/kzg.nim:228-282 analogue):
    e(C - [y]G1, G2) == e(proof, [tau]G2 - [z]G2)
rewritten as a 2-pair product check:
    e(C - [y]G1, G2) * e(proof, [z]G2 - [tau]G2) == 1

kzg_verify_batch (kzg.nim:282, spec verify_kzg_proof_batch): random linear
combination folds n openings into ONE 2-pairing check:
    e(sum_i r_i (C_i - [y_i]G1 + [z_i] proof_i), G2)
        == e(sum_i r_i proof_i, [tau]G2)
The fold runs as a single MSM over 2n+1 points.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import limbs as lb
from ..ops.msm import msm
from ..ops.pairing import get_pairing


def _g2_affine_pair(pr, settings):
    """(G2 generator affine, tau*G2 affine) from the SRS, batch (1,)."""
    g2x, g2y = settings.g2_monomial
    return (g2x[0:1], g2y[0:1]), (g2x[1:2], g2y[1:2])


def _scalar_mont_to_limbs(fr, s_mont):
    """Montgomery scalar(s) -> canonical limb array for scalar_mul."""
    return fr.from_mont(s_mont)


def kzg_pairing_verify(kzg, C, proof, z_mont, y_mont) -> bool:
    """C/proof: ((x,y) Montgomery affine batch-1 arrays, inf mask)."""
    ctx = kzg.ctx
    fr = kzg.fr
    pr = get_pairing("BLS12_381")
    (cx, cy, cinf) = C
    (px, py, pinf) = proof
    settings = kzg.s

    g2_gen, g2_tau = _g2_affine_pair(pr, settings)

    # lhs G1 point: C - [y]G1  (Jacobian)
    y_limbs = _scalar_mont_to_limbs(fr, y_mont)[None]
    G1gen = ctx.g1.from_affine(ctx.g1_gen)
    yG1 = ctx.g1.scalar_mul(y_limbs, G1gen, scalar_bits=255)
    Cj = ctx.g1.from_affine((cx, cy), inf_mask=jnp.asarray(cinf))
    lhs1 = ctx.g1.add(Cj, ctx.g1.neg(yG1))

    # rhs G2 point: [z]G2 - [tau]G2 (GLS-4 split ladder on accelerators;
    # the plain ladder on the CPU test backend keeps the XLA program at
    # its r4-validated size)
    z_limbs = _scalar_mont_to_limbs(fr, z_mont)[None]
    import jax as _jax
    if _jax.default_backend() != "cpu":
        from ..ops.glv import scalar_mul_gls4_g2
        zG2 = scalar_mul_gls4_g2(ctx, z_limbs, g2_gen)
    else:
        G2gen = ctx.g2.from_affine(g2_gen)
        zG2 = ctx.g2.scalar_mul(z_limbs, G2gen, scalar_bits=255)
    tauG2 = ctx.g2.from_affine(g2_tau)
    rhs2 = ctx.g2.add(zG2, ctx.g2.neg(tauG2))

    # affine conversions + skip masks for infinities
    (l1x, l1y), l1_inf = ctx.g1.to_affine(lhs1)
    (r2x, r2y), r2_inf = ctx.g2.to_affine(rhs2)
    proofj = ctx.g1.from_affine((px, py), inf_mask=jnp.asarray(pinf))
    (pxa, pya), p_inf = ctx.g1.to_affine(proofj)

    P = (jnp.concatenate([l1x, pxa]), jnp.concatenate([l1y, pya]))
    Q = (jnp.concatenate([g2_gen[0], r2x]),
         jnp.concatenate([g2_gen[1], r2y]))
    skip = jnp.concatenate([l1_inf, p_inf | r2_inf])
    return bool(np.asarray(pr.pairing_check(P, Q, skip_mask=skip)))


def kzg_pairing_verify_batch(kzg, Cs, proofs, zs_mont, ys_mont,
                             r_powers_mont) -> bool:
    """Batch fold: Cs/proofs ((x,y) batch-n Montgomery affine, inf masks);
    zs/ys/r_powers Montgomery (n, L)."""
    ctx = kzg.ctx
    fr = kzg.fr
    pr = get_pairing("BLS12_381")
    (cx, cy, cinf) = Cs
    (px, py, pinf) = proofs
    settings = kzg.s
    n = zs_mont.shape[0]
    g2_gen, g2_tau = _g2_affine_pair(pr, settings)

    # scalars: for C_i: r_i ; for proof_i: r_i * z_i ; for G1: -sum r_i y_i
    r_l = fr.from_mont(r_powers_mont)
    rz_l = fr.from_mont(fr.mul(r_powers_mont, zs_mont))
    s_ry = fr.neg(_field_sum(fr, fr.mul(r_powers_mont, ys_mont)))
    ry_l = fr.from_mont(s_ry)[None]

    gx, gy = ctx.g1_gen
    # zero out points flagged infinity (their x/y may be junk); scalar
    # times infinity handled by forcing scalar 0 instead
    r_l = jnp.where(cinf[:, None], jnp.zeros_like(r_l), r_l)
    rz_l = jnp.where(pinf[:, None], jnp.zeros_like(rz_l), rz_l)

    points_x = jnp.concatenate([cx, px, gx], axis=0)
    points_y = jnp.concatenate([cy, py, gy], axis=0)
    scalars = jnp.concatenate([r_l, rz_l, ry_l], axis=0)
    lhs = msm(ctx.g1, (points_x, points_y), scalars, scalar_bits=255)

    rhs = msm(ctx.g1, (px, py), r_l, scalar_bits=255)

    (lx, ly), l_inf = ctx.g1.to_affine(tuple(t[None] for t in lhs))
    (rx, ry_), r_inf = ctx.g1.to_affine(
        tuple(t[None] for t in ctx.g1.neg(rhs)))

    P = (jnp.concatenate([lx, rx]), jnp.concatenate([ly, ry_]))
    Q = (jnp.concatenate([g2_gen[0], g2_tau[0]]),
         jnp.concatenate([g2_gen[1], g2_tau[1]]))
    skip = jnp.concatenate([l_inf, r_inf])
    return bool(np.asarray(pr.pairing_check(P, Q, skip_mask=skip)))


def _field_sum(F, arr):
    n = arr.shape[0]
    while n > 1:
        h = n // 2
        head = F.add(arr[:h], arr[h:2 * h])
        arr = jnp.concatenate([head, arr[2 * h:]], axis=0) if n % 2 else head
        n = h + (n % 2)
    return arr[0]
