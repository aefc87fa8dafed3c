"""Precomputed fixed-base MSM (Herold-Hagopian strides, TPU-native).

Re-design of the reference's PrecomputedMSM
(constantine/math/elliptic/ec_multi_scalar_mul_precomp.nim:18-214): for a
FIXED base set {P_i} (an SRS, PeerDAS coset bases, pedersen generators),
precompute stride-shifted copies so the online MSM has no window recursion:

    sum_i k_i P_i = sum_{i,j} d_{ij} · ([2^(c·j)] P_i),   d_{ij} = window j

The reference stores (t,b)-parameterized 2^b-entry tables per stride layer
and walks them serially. On TPU the right shape is different: store ONE
shifted affine copy per (window, point) — (W·N) points — and run a single
flat bucket accumulation over all of them (ops/msm.py machinery). Benefits
vs the online Pippenger:

* no window-combine doubling chain (the c·W serial doublings vanish);
* the window size c is freed from the table-cost tradeoff, so it can grow
  until bucket count (2^(c-1)) balances stream length (N·W ∝ 1/c): the
  sorted stream shrinks ~2x for EIP-4844 shapes (c 8 -> 13);
* the precompute is itself batched (c doublings per stride layer, one
  batched to_affine inversion per layer) and cacheable on device.

Used for: kzg_commit over the Lagrange SRS (models/kzg.py), PeerDAS coset
MSMs (the reference's use site, eth_eip7594_peerdas via
commitments_setups/ethereum_kzg_srs.nim:122-134 spectrum-bank knobs).
"""

from __future__ import annotations

import jax.numpy as jnp


def best_precomp_window(n: int, bits: int = 255) -> int:
    """Pick c to balance stream length N·ceil(bits/c) against bucket count
    2^(c-1) (both drive the flush-scan + segmented-reduce cost)."""
    best, best_cost = 8, float("inf")
    for c in range(6, 17):
        W = -(-bits // c) + 1
        cost = n * W + (1 << (c - 1)) * 4
        if cost < best_cost:
            best, best_cost = c, cost
    return best


class PrecomputedMSM:
    """Fixed-base MSM context. Build once per base set, reuse per call.

    group: ops.ec.ECGroup; points_aff: (x, y) affine arrays, batch N;
    c: window bits (default model above); scalar_bits: static bound.
    """

    def __init__(self, group, points_aff, c: int = None,
                 scalar_bits: int = 255):
        self.group = group
        self.F = group.F
        px, py = points_aff
        self.N = px.shape[0]
        self.bits = scalar_bits
        self.c = c or best_precomp_window(self.N, scalar_bits)
        # +1 window: signed-digit recoding carries out of the top window
        self.W = -(-scalar_bits // self.c) + 1
        self._tables = self._precompute((px, py))

    def _precompute(self, pts):
        """[2^(c·j)]P_i for j in 0..W-1, affine, shape (W·N,).

        Layer j+1 = layer j doubled c times (batched Jacobian doublings, one
        batched inversion per layer to return to affine — the madd-based
        accumulation in the online phase needs affine inputs).
        """
        g = self.group
        layers = [pts]
        cur = g.from_affine(pts)
        for _ in range(self.W - 1):
            for _ in range(self.c):
                cur = g.double(cur)
            aff, _inf = g.to_affine(cur)
            layers.append(aff)
            cur = g.from_affine(aff)
        tx = jnp.concatenate([a[0] for a in layers], axis=0)
        ty = jnp.concatenate([a[1] for a in layers], axis=0)
        return (tx, ty)

    def __call__(self, scalars, use_pallas: bool = None):
        """MSM over the fixed bases. scalars: (N, Ls) canonical 16-bit
        limbs. Returns a Jacobian point (batch ()).

        Online work: signed digits (W, N) -> signs applied to the
        precomputed affine copies -> ONE flat bucket accumulation via
        ops.msm.msm with c-bit digit scalars (single effective window,
        so its window-combine degenerates to a copy).
        """
        from .msm import _signed_digits, msm
        g = self.group
        digits = _signed_digits(scalars, self.c, self.W)      # (W, N)
        flat = digits.reshape(1, -1)                          # 1 window, W·N
        return msm(g, self._tables, None, c=self.c, digits=flat,
                   use_pallas=use_pallas)

    def batch(self, scalars):
        """B independent fixed-base MSMs in ONE bucket pipeline.

        scalars: (B, N, Ls) canonical limbs -> Jacobian points (B, L) per
        coordinate. The B digit rows ride the pipeline's window axis with
        combine=False (per-row sums ARE the results) — the TPU analogue of
        the reference's per-blob parallel commit fan-out
        (ethereum_eip4844_kzg_parallel.nim:125).
        """
        import jax
        import os
        from .msm import _signed_digits
        B = scalars.shape[0]
        pallas_ok = (jax.default_backend() != "cpu"
                     or os.environ.get("CTT_MSM_PALLAS") == "1") \
            and not hasattr(self.F, "deg") and self.group.a_int == 0
        if not pallas_ok:
            # XLA fallback (CPU tests): one pipeline per row
            outs = [self(scalars[i]) for i in range(B)]
            return tuple(jnp.stack([o[k] for o in outs]) for k in range(3))
        from .msm_tpu import msm_tpu
        dig = jax.vmap(_signed_digits, in_axes=(0, None, None))(
            scalars, self.c, self.W)                  # (B, W, N)
        dig = dig.reshape(B, -1)                      # rows over the table
        return msm_tpu(self.group, self._tables, None, c=self.c,
                       digits=dig, combine=False)
