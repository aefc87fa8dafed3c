"""FFT over elliptic-curve points (EC-FFT) — batched butterflies.

Re-design of the reference's EC-FFT (constantine/math/polynomials/
fft_ec.nim:34-260): the same radix-2 DIT structure as ops/ntt.py, but
elements are G1 Jacobian points and the twiddle multiplication is a batched
scalar multiplication. Used by FK20 (EIP-7594 cell proofs).

Twiddles are STATIC scalars (roots of unity), laid out per stage as limb
tables; every stage is one batched CT scalar-mul + one batched point
add/sub pair.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as lb
from .ntt import bit_reversal_perm


class ECFFTDomain:
    def __init__(self, group, r_order: int, omega: int, log_n: int):
        """group: ECGroup (G1); omega: primitive 2^log_n-th root in Fr."""
        self.group = group
        self.log_n = log_n
        self.n = 1 << log_n
        self.omega = omega
        self.r = r_order
        Ls = lb.num_limbs(r_order.bit_length())
        self.Ls = Ls

        def stage_tables(w):
            tabs = []
            for s in range(log_n):
                m = 1 << (s + 1)
                stride = self.n // m
                tabs.append(jnp.asarray(lb.ints_to_limbs(
                    [pow(w, stride * k, r_order) for k in range(m // 2)], Ls)))
            return tabs

        self.tw_fwd = stage_tables(omega)
        self.tw_inv = stage_tables(pow(omega, -1, r_order))
        self.n_inv_limbs = jnp.asarray(
            lb.int_to_limbs(pow(self.n, -1, r_order), Ls))
        self.brp = jnp.asarray(bit_reversal_perm(self.n))
        self.scalar_bits = r_order.bit_length()
        self._fwd = jax.jit(functools.partial(self._transform, inverse=False))
        self._inv = jax.jit(functools.partial(self._transform, inverse=True))

    def _transform(self, P, inverse: bool):
        """P: Jacobian tuple of (n, ...) arrays, natural in/out."""
        g = self.group
        n = self.n
        P = tuple(jnp.take(t, self.brp, axis=0) for t in P)
        tws = self.tw_inv if inverse else self.tw_fwd
        for s in range(self.log_n):
            m = 1 << (s + 1)
            blocks = n // m
            half = m // 2
            a = tuple(t.reshape((blocks, 2, half) + t.shape[1:])[:, 0]
                      for t in P)
            b = tuple(t.reshape((blocks, 2, half) + t.shape[1:])[:, 1]
                      for t in P)
            # flatten (blocks, half) for the batched scalar mul
            bf = tuple(t.reshape((blocks * half,) + t.shape[2:]) for t in b)
            tw = jnp.tile(tws[s], (blocks, 1))
            t_pt = g.scalar_mul(tw, bf, scalar_bits=self.scalar_bits)
            af = tuple(t.reshape((blocks * half,) + t.shape[2:]) for t in a)
            lo = g.add(af, t_pt)
            hi = g.add(af, g.neg(t_pt))
            P = tuple(
                jnp.concatenate([l.reshape((blocks, half) + l.shape[1:]),
                                 h.reshape((blocks, half) + h.shape[1:])],
                                axis=1).reshape((n,) + l.shape[1:])
                for l, h in zip(lo, hi))
        if inverse:
            ninv = jnp.broadcast_to(self.n_inv_limbs, (n, self.Ls))
            P = g.scalar_mul(ninv, P, scalar_bits=self.scalar_bits)
        return P

    def fft(self, P):
        """EC-FFT natural -> natural (ec_fft_nn analogue, fft_ec.nim:193)."""
        return self._fwd(P)

    def ifft(self, P):
        return self._inv(P)
