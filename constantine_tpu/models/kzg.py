"""KZG polynomial commitments over bit-reversed Lagrange bases.

Re-design of the reference's curve-generic KZG core
(constantine/commitments/kzg.nim:177-282 kzg_commit/kzg_prove/kzg_verify and
the quotient-polynomial machinery in
commitments/protocol_quotient_check.nim:23-167) specialized to the EIP-4844
radix-2 domain, fully batched:

* commit = one Pippenger MSM over the brp Lagrange SRS;
* evaluation at z uses the barycentric formula
  (math/polynomials/polynomials.nim:384-446 evalPolyAt), dense with the
  in-domain case resolved by masking rather than branching;
* the quotient polynomial (both off-domain and in-domain z) is built from
  ONE batched inversion over the 4096 denominators — the inverseDifference
  Array trick (polynomials.nim:288) in SPMD form.

Verification (pairing check) lives here too once models/pairing wiring is in.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import limbs as lb
from ..ops.msm import msm
from .trusted_setup import KZGSettings, FIELD_ELEMENTS_PER_BLOB


class KZG:
    def __init__(self, settings: KZGSettings):
        self.s = settings
        self.ctx = settings.ctx
        self.fr = self.ctx.fr
        _ = self.ctx.g1, self.ctx.g2, self.ctx.g1_gen, self.ctx.g2_gen
        dom = settings.domain
        # domain roots in brp order, Montgomery form (device constants)
        roots_nat = self.fr.encode(dom.domain_int)
        brp = np.asarray(dom.brp)
        self.roots_brp = jnp.asarray(roots_nat[brp])
        N = FIELD_ELEMENTS_PER_BLOB
        self.n_inv = jnp.asarray(
            self.fr.encode([pow(N, -1, self.fr.p_int)])[0])
        # Fixed-base acceleration: the commit/prove MSM bases are the same
        # SRS forever, so stride-shifted tables (ops/msm_precomp.py — the
        # reference's PrecomputedMSM / PeerDAS spectrum-bank precompute
        # pattern, ethereum_kzg_srs.nim:122-134) remove the window
        # recursion. Default on for accelerator backends; CTT_KZG_PRECOMP
        # overrides (CPU test runs skip the precompute cost).
        import os
        pre = os.environ.get("CTT_KZG_PRECOMP")
        if pre is None:
            pre = "1" if jax.default_backend() != "cpu" else "0"
        self._pm = None
        if pre == "1":
            from ..ops.msm_precomp import PrecomputedMSM
            self._pm = PrecomputedMSM(self.ctx.g1, self.s.g1_lagrange_brp,
                                      scalar_bits=255)
        self.commit = jax.jit(self.commit)
        self.eval_at = jax.jit(self.eval_at)
        self.compute_quotient = jax.jit(self.compute_quotient)

        # Fused protocol exports: one jit dispatch from input limbs all the
        # way to canonical affine output (+ y-sign + inf). The remote-TPU
        # tunnel costs ~25 ms PER dispatch, so the commit/prove entry
        # points must not scatter to_affine/from_mont across calls.
        def _export_g1(P):
            # ONE packed (N, L+2) u32 output: [x_canon | y_is_big | inf] —
            # a single device_get (each fetched leaf pays a full link RTT).
            (x, y), inf = self.ctx.g1.to_affine(tuple(t[None] for t in P))
            fp = self.ctx.fp
            xc = fp.from_mont(x)
            yc = fp.from_mont(y)
            from ..ops import limbs as lb
            half = jnp.asarray(lb.int_to_limbs((fp.p_int + 1) // 2, fp.L))
            big = lb.geq(yc, half)
            return jnp.concatenate(
                [xc, big[..., None].astype(jnp.uint32),
                 inf[..., None].astype(jnp.uint32)], axis=-1)

        self.export_g1 = jax.jit(_export_g1)
        self.commit_export = jax.jit(lambda ev: _export_g1(self.commit(ev)))

        def _prove_export(evals_mont, z_mont):
            proof, y = self.prove(evals_mont, z_mont)
            yc = self.fr.from_mont(y)
            g1p = _export_g1(proof)                       # (1, L+2)
            pad = g1p.shape[-1] - yc.shape[-1]
            return jnp.concatenate(
                [g1p, jnp.pad(yc[None], ((0, 0), (0, pad)))], axis=0)

        self.prove_export = jax.jit(_prove_export)

        def _commit_batch_export(polys):
            # (B, N, L) canonical evals -> (B, L+2) packed canonical affine.
            # One bucket pipeline for ALL blobs (PrecomputedMSM.batch rides
            # the window axis) — per-blob parallel commit, the reference's
            # ethereum_eip4844_kzg_parallel.nim:125 analogue.
            B = polys.shape[0]
            if self._pm is not None:
                P = self._pm.batch(polys)
            else:
                outs = [self.commit(polys[i]) for i in range(B)]
                P = tuple(jnp.stack([o[k] for o in outs]) for k in range(3))
            (x, y), inf = self.ctx.g1.to_affine(P)
            fp = self.ctx.fp
            xc = fp.from_mont(x)
            yc = fp.from_mont(y)
            from ..ops import limbs as lb
            half = jnp.asarray(lb.int_to_limbs((fp.p_int + 1) // 2, fp.L))
            big = lb.geq(yc, half)
            return jnp.concatenate(
                [xc, big[..., None].astype(jnp.uint32),
                 inf[..., None].astype(jnp.uint32)], axis=-1)

        self.commit_batch_export = jax.jit(_commit_batch_export)

    @staticmethod
    def unpack_export(packed):
        """(N, L+2) packed export -> (x_canon, y_big, inf) numpy views."""
        import numpy as _np
        arr = _np.asarray(packed)
        return arr[:, :-2], arr[:, -2].astype(bool), arr[:, -1].astype(bool)

    def _msm_srs(self, scalars_canonical):
        """MSM over the Lagrange SRS: precomputed fixed-base path when
        enabled, plain Pippenger otherwise."""
        if self._pm is not None:
            return self._pm(scalars_canonical)
        return msm(self.ctx.g1, self.s.g1_lagrange_brp, scalars_canonical,
                   scalar_bits=255)

    # -- commitment ------------------------------------------------------------

    def commit(self, evals_brp_canonical):
        """evals (N=4096, L) canonical Fr limbs, brp order -> Jacobian G1.
        kzg_commit analogue (kzg.nim:177-202)."""
        return self._msm_srs(evals_brp_canonical)

    # -- barycentric evaluation --------------------------------------------------

    def eval_at(self, evals_brp_mont, z_mont):
        """p(z) via barycentric formula on the brp-ordered evaluation form:
        y = (z^N - 1)/N * sum_i p_i w_i / (z - w_i), with the in-domain case
        (z == w_m) masked to y = p_m. Returns (y_mont (L,), in_domain mask).
        """
        F = self.fr
        N = FIELD_ELEMENTS_PER_BLOB
        roots = self.roots_brp                       # (N, L) Montgomery
        zb = jnp.broadcast_to(z_mont, roots.shape)
        diff = F.sub(zb, roots)                      # z - w_i
        in_dom = F.is_zero(diff)                     # at most one true
        inv_diff = F.batch_inv(diff)                 # 0 where in-domain
        terms = F.mul(F.mul(evals_brp_mont, roots), inv_diff)
        ssum = _tree_sum_field(F, terms)
        zn = F.pow_const(z_mont, N)
        scale = F.mul(F.sub(zn, F.broadcast_one(())), self.n_inv)
        y_off = F.mul(scale, ssum)
        # in-domain: select p_m
        y_in = _tree_sum_field(F, F.cselect(in_dom, evals_brp_mont,
                                            jnp.zeros_like(evals_brp_mont)))
        hit = jnp.any(in_dom)
        y = F.cselect(hit, y_in, y_off)
        return y, hit, in_dom

    # -- quotient + proof ----------------------------------------------------------

    def compute_quotient(self, evals_brp_mont, z_mont):
        """Quotient polynomial q in evaluation (brp) form for (p(X)-y)/(X-z).

        Off-domain (protocol_quotient_check.nim:23):
            q_i = (p_i - y) / (w_i - z)
        In-domain z = w_m (:102, ckzg compute_kzg_proof_impl):
            q_i = (p_i - y) / (w_i - z)           for i != m
            q_m = sum_{i!=m} (p_i - y) * w_i / (w_m * (w_m - w_i))
        Returns (q_mont (N, L), y_mont)."""
        F = self.fr
        roots = self.roots_brp
        y, hit, in_dom = self.eval_at(evals_brp_mont, z_mont)
        zb = jnp.broadcast_to(z_mont, roots.shape)
        num = F.sub(evals_brp_mont, jnp.broadcast_to(y, evals_brp_mont.shape))
        den = F.sub(roots, zb)
        den_inv = F.batch_inv(den)                  # 0 at i == m
        q = F.mul(num, den_inv)
        # in-domain correction for position m:
        # q_m = sum_{i != m} (p_i - y) * w_i * inv(w_m) * inv(w_m - w_i)
        # note: w_m == z when hit, and den_inv_i = inv(w_i - z) so
        # inv(w_m - w_i) = -den_inv_i
        w_m = z_mont  # when hit, z IS the root w_m
        wm_inv = F.inv(w_m)
        t = F.mul(F.mul(num, roots), den_inv)
        t = F.mul(t, jnp.broadcast_to(wm_inv, t.shape))
        qm = F.neg(_tree_sum_field(F, t))
        q = F.cselect(in_dom, jnp.broadcast_to(qm, q.shape), q)
        return q, y

    def prove(self, evals_brp_mont, z_mont):
        """KZG opening proof: commit to the quotient (kzg.nim:204-228).
        Returns (proof Jacobian G1 point, y_mont)."""
        q, y = self.compute_quotient(evals_brp_mont, z_mont)
        q_canonical = self.fr.from_mont(q)
        proof = self._msm_srs(q_canonical)
        return proof, y


def _tree_sum_field(F, arr):
    """Sum (N, L) field elements to (L,), log depth, N power of two."""
    n = arr.shape[0]
    while n > 1:
        arr = F.add(arr[: n // 2], arr[n // 2: n])
        n //= 2
    return arr[0]


@functools.lru_cache(maxsize=None)
def get_kzg() -> KZG:
    from .trusted_setup import get_settings
    return KZG(get_settings())
