"""Multilinear extensions over the boolean hypercube — batched.

Re-design of the reference's MLE module
(constantine/boolean_hypercube/multilinear_extensions.nim:52-306): the
multilinear extension of f: {0,1}^v -> F is

    MLE(x) = sum_w f(w) * prod_i (x_i w_i + (1 - x_i)(1 - w_i))

evaluated with the standard O(2^v) fold: per variable, combine table halves
as lo*(1-x_i) + hi*x_i. The reference provides big-endian (x_1 = most
significant index bit) and little-endian variable orders; both are here.

TPU design: the fold is v sequential steps of fully lane-parallel field
ops; evaluation points are batched on a leading axis (one fold evaluates
the MLE at B points at once — the sum-check prover's inner loop shape).
"""

from __future__ import annotations

import jax.numpy as jnp


class MLE:
    """Multilinear extension of a 2^v-entry evaluation table."""

    def __init__(self, F, evals, num_vars: int = None):
        """F: ops.field.Field; evals: (2^v, L) Montgomery-form table."""
        self.F = F
        self.evals = evals
        n = evals.shape[0]
        assert n & (n - 1) == 0
        self.num_vars = num_vars or (n.bit_length() - 1)

    def evaluate(self, xs, endian: str = "big"):
        """Evaluate at B points: xs (B, v, L) Montgomery coords ->
        (B, L). endian='big': x[0] selects the MOST significant index bit
        (evalMultilinearExtensionAt_BE); 'little': the least significant."""
        F = self.F
        B = xs.shape[0]
        v = self.num_vars
        # table broadcast to the batch: (B, 2^v, L)
        table = jnp.broadcast_to(self.evals[None],
                                 (B,) + self.evals.shape)
        one = F.broadcast_one((B, 1))
        for i in range(v):
            # big: x_i selects index bit (v-1-i) -> fold halves, x_0 first;
            # little: x_i selects bit i -> fold adjacent pairs, x_0 first.
            xi = xs[:, i][:, None]
            half = table.shape[1] // 2
            if endian == "big":
                lo, hi = table[:, :half], table[:, half:]
            else:
                lo, hi = table[:, 0::2], table[:, 1::2]
            # lo*(1-x) + hi*x = lo + x*(hi - lo)
            table = F.add(lo, F.mul(jnp.broadcast_to(xi, lo.shape),
                                    F.sub(hi, lo)))
        return table[:, 0]
