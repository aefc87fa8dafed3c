"""Fused Pallas G1 decompression: sqrt + sign + endomorphism subgroup check.

Measured on the chip: the XLA form of g1 decompression costs ~686 ms PER
POINT — the sqrt pow chain (381 lax.scan steps) and the Scott subgroup
ladder (127 steps) execute as loops of tiny launch-overhead-dominated XLA
ops. This kernel runs the whole thing — rhs = x^3 + 4, y = rhs^((p+1)/4)
(p = 3 mod 4 branch, finite_fields_square_root.nim:29), lexicographic sign
selection (codecs_bls12_381.nim:116), and the Scott 2021 membership test
phi(P) == [-u^2]P (bls12_381_subgroups.nim:170, ops/subgroups.py) — inside
ONE Pallas program with compact fori-loop CIOS muls, for any lane batch.
~11 ms for up to 128 points instead of 0.7 s each.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_ec import _CPARAMS, _interpret
from .pallas_pairing import _CKF


class PallasG1:
    def __init__(self, block: int = 128):
        from ..named.precompute import get_curve
        ctx = get_curve("BLS12_381")
        self.ctx = ctx
        F = ctx.fp
        self.F = F
        self.L = L = F.L
        self.block = block
        self._p_limbs = tuple(int(v) for v in F.p)
        self._m0 = np.uint32(F.m0ninv)
        p = F.p_int
        u = ctx.params.x_param
        from .glv import get_glv
        beta = get_glv("BLS12_381").beta_mont          # (L,) mont
        # consts rows: 0 p, 1 one, 2 beta, 3 comp_half = 2^16L - (p+1)/2
        comp_half = (1 << (16 * L)) - (p + 1) // 2
        consts = np.zeros((4, L, 128), np.uint32)
        consts[0] = np.asarray(F.p, np.uint32)[:, None]
        consts[1] = np.asarray(F.one, np.uint32)[:, None]
        consts[2] = np.asarray(beta, np.uint32)[:, None]
        from . import limbs as lb
        consts[3] = np.asarray(lb.int_to_limbs(comp_half, L),
                               np.uint32)[:, None]
        self._consts = consts
        sb = [int(c) for c in bin((p + 1) // 4)[2:]]
        self._sqrt_bits = np.asarray(sb, np.int32)[None]
        u2 = u * u
        ub = [int(c) for c in bin(u2)[3:]]             # after leading 1
        self._u2_bits = np.asarray(ub, np.int32)[None]
        self._cache = {}

    @staticmethod
    def _wide(row, TB):
        k = TB // 128
        return row if k == 1 else jnp.concatenate([row] * k, axis=1)

    def _fn(self, Bp, TB):
        key = (Bp, TB)
        if key in self._cache:
            return self._cache[key]
        L = self.L
        nsb = self._sqrt_bits.shape[1]
        nub = self._u2_bits.shape[1]

        def kern(sb_ref, ub_ref, xm_ref, sg_ref, c_ref,
                 oy_ref, ok_ref, dbl_ref):
            kf = _CKF(L, self._p_limbs, self._m0,
                      self._wide(c_ref[0], TB), self._wide(c_ref[1], TB))
            beta = self._wide(c_ref[2], TB)
            comp_half = self._wide(c_ref[3], TB)
            xm = xm_ref[:, :]
            one = kf.one_col
            four = kf.add(kf.add(one, one), kf.add(one, one))
            rhs = kf.add(kf.mul(kf.sq(xm), xm), four)  # x^3 + b (b = 4)

            # y = rhs^((p+1)/4)  (p = 3 mod 4)
            def sqbody(i, acc):
                acc = kf.mul(acc, acc)
                withm = kf.mul(acc, rhs)
                return jnp.where(sb_ref[0, i] == 1, withm, acc)
            y = jax.lax.fori_loop(1, nsb, sqbody, rhs)
            is_sq = jnp.all(kf.mul(y, y) == rhs, axis=0)

            # lexicographic sign: y_canon >= (p+1)/2  <=>  carry out of
            # y_canon + (2^16L - (p+1)/2)
            y_canon = kf.mul(y, jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (L, TB), 0) == 0,
                jnp.uint32(1), jnp.uint32(0)))          # montmul by 1
            _, co = kf.norm_ks(y_canon + comp_half, pre_rounds=1)
            is_big = co > 0
            flip = is_big != (sg_ref[0, :] == 1)
            y = jnp.where(flip[None, :], kf.neg(y), y)

            # subgroup: phi(P) == [-u^2]P with phi = (beta x, y)
            def ladbody(i, T):
                X, Y, Z = T
                X, Y, Z = kf.ec_double(X, Y, Z)
                Xa, Ya, Za = kf.ec_madd(X, Y, Z, xm, y, dbl_ref)
                take = (ub_ref[0, i] == 1)
                return (jnp.where(take, Xa, X), jnp.where(take, Ya, Y),
                        jnp.where(take, Za, Z))
            zero = jnp.zeros((L, TB), jnp.uint32)
            T = jax.lax.fori_loop(0, nub, ladbody, (xm, y, one + zero))
            Xt, Yt, Zt = T
            # compare (beta x, y, 1) == -(Xt, Yt, Zt): cross-multiplied
            Z2 = kf.sq(Zt)
            ex = jnp.all(kf.mul(kf.mul(beta, xm), Z2) == Xt, axis=0)
            ey = jnp.all(kf.mul(kf.mul(y, Zt), Z2) == kf.neg(Yt), axis=0)
            t_inf = jnp.all(Zt == 0, axis=0)
            in_sub = ex & ey & ~t_inf
            oy_ref[:, :] = y
            ok_ref[0, :] = (is_sq & in_sub).astype(jnp.uint32)

        fn = pl.pallas_call(
            kern,
            grid=(Bp // TB,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((L, TB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TB), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, L, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((L, TB), lambda i: (0, i),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, TB), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((L, Bp), jnp.uint32),
                       jax.ShapeDtypeStruct((1, Bp), jnp.uint32)],
            scratch_shapes=[pltpu.VMEM((3, L, TB), jnp.uint32)],
            interpret=_interpret(),
            compiler_params=_CPARAMS,
        )
        self._cache[key] = fn
        return fn

    def decompress(self, x_canon, sign_big):
        """(N, L) canonical x limbs + (N,) sign mask ->
        ((x_mont, y_mont) (N, L) each, ok (N,) — is-square AND in-subgroup.
        Composable inside a caller jit; infinity lanes are the caller's
        business (their ok is overridden by host flag logic)."""
        F = self.F
        xm = F.to_mont(x_canon)
        N = xm.shape[0]
        TB = max(128, min(self.block, -(-N // 128) * 128))
        Bp = -(-N // TB) * TB
        xT = jnp.pad(xm.T, ((0, 0), (0, Bp - N)))
        sg = jnp.pad(sign_big.astype(jnp.int32)[None], ((0, 0), (0, Bp - N)))
        fn = self._fn(Bp, TB)
        y, ok = fn(self._sqrt_bits, self._u2_bits, xT, sg, self._consts)
        return (xm, y.T[:N]), ok[0, :N].astype(bool)


@functools.lru_cache(maxsize=None)
def get_pallas_g1(block: int = 128) -> PallasG1:
    return PallasG1(block=block)
