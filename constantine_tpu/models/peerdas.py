"""EIP-7594 PeerDAS: cells, FK20 cell proofs, batch verification, recovery.

Re-design of the reference's PeerDAS stack:
* public API: constantine/eth_eip7594_peerdas.nim:207-621 (compute_cells,
  compute_cells_and_kzg_proofs, verify_cell_kzg_proof_batch,
  recover_cells_and_kzg_proofs, batch challenge transcript at :440-510);
* FK20 multiproofs: commitments/kzg_multiproofs.nim:227-451 (polyphase
  decomposition of the SRS + circulant Toeplitz products in the Fourier
  domain + EC-FFT), matrix machinery in math/matrix/toeplitz.nim:92-143;
* erasure recovery: data_availability_sampling/eth_peerdas.nim:83-132
  (vanishing-polynomial technique).

TPU mapping: the 64 circulant FFTs run as ONE batched NTT; the 64x128
Hadamard-MSM runs as ONE batched 8192-lane scalar-mul + log-depth point
reduction; EC-FFTs batch their butterflies per stage.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..named.precompute import get_curve
from ..ops import limbs as lb
from ..ops.ec_fft import ECFFTDomain
from ..ops.msm import msm
from ..ops.ntt import bit_reversal_perm, get_domain
from ..utils.hashes import sha256
from ..utils.serialization import get_codec
from .trusted_setup import FIELD_ELEMENTS_PER_BLOB, get_settings
from .eip4844 import blob_to_polynomial, _point_to_bytes
from .kzg import get_kzg

FIELD_ELEMENTS_PER_CELL = 64
CELLS_PER_EXT_BLOB = 128
FIELD_ELEMENTS_PER_EXT_BLOB = 8192
BYTES_PER_CELL = FIELD_ELEMENTS_PER_CELL * 32
RANDOM_CHALLENGE_KZG_CELL_BATCH_DOMAIN = b"RCKZGCBATCH__V1_"
RECOVERY_SHIFT = 7


class PeerDAS:
    def __init__(self):
        self.settings = get_settings()
        self.kzg = get_kzg()
        self.ctx = get_curve("BLS12_381")
        self.fr = self.ctx.fr
        self.codec = get_codec()
        self.dom_blob = get_domain("BLS12_381", 12)     # 4096
        self.dom_ext = get_domain("BLS12_381", 13)      # 8192
        self.dom_cds = get_domain("BLS12_381", 7)       # 128 (CDS)
        self.dom_cell = get_domain("BLS12_381", 6)      # 64
        omega128 = self.ctx.root_of_unity(7)
        self.ec_cds = ECFFTDomain(self.ctx.g1, self.ctx.r, omega128, 7)
        self.brp128 = bit_reversal_perm(CELLS_PER_EXT_BLOB)
        self.brp64 = bit_reversal_perm(FIELD_ELEMENTS_PER_CELL)
        self.brp8192 = bit_reversal_perm(FIELD_ELEMENTS_PER_EXT_BLOB)
        # coset shifts h_i = omega_ext^rev7(i); heads^64 are 128th roots
        w_ext = self.dom_ext.omega
        self.coset_shifts = [pow(w_ext, int(self.brp128[i]), self.ctx.r)
                             for i in range(CELLS_PER_EXT_BLOB)]
        # circulant gather indices/mask (toeplitz.nim:92-143 layout)
        n, L, cds = FIELD_ELEMENTS_PER_BLOB, FIELD_ELEMENTS_PER_CELL, 128
        idx = np.zeros((L, cds), np.int64)
        mask = np.zeros((L, cds), bool)
        for off in range(L):
            idx[off, 0] = n - 1 - off
            mask[off, 0] = True
            for j in range(1, cds // 2 - 1):
                idx[off, cds - j] = n - 1 - off - j * L
                mask[off, cds - j] = True
        self._circ_idx = jnp.asarray(idx)
        self._circ_mask = jnp.asarray(mask)
        self._bank = None

    # ------------------------------------------------------------------
    # FK20 precompute: polyphase spectrum bank
    # ------------------------------------------------------------------

    @property
    def bank(self):
        """(L=64, CDS=128) Jacobian spectrum bank from the monomial SRS
        (computePolyphaseDecompositionFourier analogue,
        kzg_multiproofs.nim:303)."""
        if self._bank is None:
            import os
            cache = self.settings and getattr(self.settings, "_bank_cache",
                                              None)
            path = "/tmp/ctt_fk20_bank.npz"
            if os.path.exists(path):
                z = np.load(path)
                self._bank = (jnp.asarray(z["x"]), jnp.asarray(z["y"]),
                              jnp.asarray(z["z"]))
                return self._bank
            mx, my = self.settings.g1_monomial
            n, L, cds = FIELD_ELEMENTS_PER_BLOB, FIELD_ELEMENTS_PER_CELL, 128
            banks = []
            for off in range(L):
                sel = [n - L - 1 - off - j * L for j in range(cds // 2 - 1)]
                sel_idx = jnp.asarray(np.asarray(sel))
                px = jnp.take(mx, sel_idx, axis=0)
                py = jnp.take(my, sel_idx, axis=0)
                P = self.ctx.g1.from_affine((px, py))
                inf = self.ctx.g1.infinity((cds - len(sel),))
                P = tuple(jnp.concatenate([a, b], axis=0)
                          for a, b in zip(P, inf))
                banks.append(self.ec_cds.fft(P))
            bx = jnp.stack([b[0] for b in banks])
            by = jnp.stack([b[1] for b in banks])
            bz = jnp.stack([b[2] for b in banks])
            self._bank = (bx, by, bz)
            try:
                np.savez(path, x=np.asarray(bx), y=np.asarray(by),
                         z=np.asarray(bz))
            except OSError:
                pass
        return self._bank

    # ------------------------------------------------------------------
    # cells
    # ------------------------------------------------------------------

    def _blob_to_coeffs(self, blob: bytes):
        """blob -> polynomial coefficients (4096, L) Montgomery, or None."""
        poly, ok = blob_to_polynomial(blob)
        if not ok:
            return None
        evals_brp = self.fr.to_mont(jnp.asarray(poly))
        evals_nat = jnp.take(evals_brp, jnp.asarray(
            bit_reversal_perm(FIELD_ELEMENTS_PER_BLOB)), axis=0)
        return self.dom_blob.intt(evals_nat)

    def _coeffs_to_cells_bytes(self, coeffs):
        ext = jnp.concatenate(
            [coeffs, jnp.zeros_like(coeffs)], axis=0)
        evals = self.dom_ext.ntt(ext)
        evals_brp = jnp.take(evals, jnp.asarray(self.brp8192), axis=0)
        canon = self.fr.from_mont(evals_brp)
        data = lb.limbs_to_bytes_be(np.asarray(jax.device_get(canon)), 32)
        return [data[i * BYTES_PER_CELL:(i + 1) * BYTES_PER_CELL]
                for i in range(CELLS_PER_EXT_BLOB)]

    def compute_cells(self, blob: bytes):
        """-> list of 128 cells (2048 bytes each) or None
        (eth_eip7594_peerdas.nim:207)."""
        coeffs = self._blob_to_coeffs(blob)
        if coeffs is None:
            return None
        return self._coeffs_to_cells_bytes(coeffs)

    def _fk20_proofs(self, coeffs):
        """128 cell proofs (Jacobian tuple, brp cell order) via FK20
        (kzg_coset_prove_impl analogue, kzg_multiproofs.nim:374)."""
        F = self.fr
        g1 = self.ctx.g1
        L, cds = FIELD_ELEMENTS_PER_CELL, 128
        # circulant matrix (64, 128) built with one gather + mask
        circ = jnp.take(coeffs, self._circ_idx.reshape(-1), axis=0)
        circ = circ.reshape(L, cds, F.L)
        circ = jnp.where(self._circ_mask[..., None], circ,
                         jnp.zeros_like(circ))
        w = self.dom_cds.ntt(circ)                     # (64, 128, L) batched
        w_canon = F.from_mont(w)
        # Hadamard-MSM: u_k = sum_i w[i,k] * bank[i,k] — one 8192-lane
        # scalar-mul + log-depth reduction over i
        bx, by, bz = self.bank
        flatP = (bx.reshape(L * cds, -1), by.reshape(L * cds, -1),
                 bz.reshape(L * cds, -1))
        scaled = g1.scalar_mul(w_canon.reshape(L * cds, F.L), flatP,
                               scalar_bits=255)
        u = tuple(t.reshape((L, cds) + t.shape[1:]) for t in scaled)
        m = L
        while m > 1:
            h = m // 2
            u = g1.add(tuple(t[:h] for t in u), tuple(t[h:m] for t in u))
            m = h
        u = tuple(t[0] for t in u)                     # (128, ...)
        # zero upper half, EC-FFT, brp
        inf = self.ctx.g1.infinity((cds // 2,))
        u = tuple(jnp.concatenate([t[:cds // 2], i], axis=0)
                  for t, i in zip(u, inf))
        proofs = self.ec_cds.fft(u)
        return tuple(jnp.take(t, jnp.asarray(self.brp128), axis=0)
                     for t in proofs)

    def compute_cells_and_kzg_proofs(self, blob: bytes):
        """-> (cells, proofs bytes list) or None
        (eth_eip7594_peerdas.nim:270)."""
        coeffs = self._blob_to_coeffs(blob)
        if coeffs is None:
            return None
        cells = self._coeffs_to_cells_bytes(coeffs)
        proofs = self._fk20_proofs(coeffs)
        (px, py), inf = self.ctx.g1.to_affine(proofs)
        pbytes = self.codec.g1_compress((px, py), np.asarray(inf))
        proofs_list = [pbytes[i * 48:(i + 1) * 48]
                       for i in range(CELLS_PER_EXT_BLOB)]
        return cells, proofs_list

    # ------------------------------------------------------------------
    # batch verification
    # ------------------------------------------------------------------

    def _cell_to_scalars(self, cell: bytes):
        limbs, ok = self.codec.scalars_from_bytes(cell)
        if not ok.all():
            return None
        return limbs

    def _batch_challenge(self, unique_commitments, commitment_indices,
                         cell_indices, cells, proofs):
        """Fiat-Shamir r (eth_eip7594_peerdas.nim:475-510 transcript)."""
        t = [RANDOM_CHALLENGE_KZG_CELL_BATCH_DOMAIN,
             FIELD_ELEMENTS_PER_BLOB.to_bytes(8, "big"),
             FIELD_ELEMENTS_PER_CELL.to_bytes(8, "big"),
             len(unique_commitments).to_bytes(8, "big"),
             len(cell_indices).to_bytes(8, "big")]
        for c in unique_commitments:
            t.append(c)
        for k in range(len(cell_indices)):
            t.append(commitment_indices[k].to_bytes(8, "big"))
            t.append(cell_indices[k].to_bytes(8, "big"))
            t.append(cells[k])
            t.append(proofs[k])
        return int.from_bytes(sha256(b"".join(t)), "big") % self.ctx.r

    def verify_cell_kzg_proof_batch(self, commitments, cell_indices, cells,
                                    proofs):
        """commitments/proofs: list of 48-byte strings; cells: list of
        2048-byte strings; cell_indices: ints. -> bool or None
        (eth_eip7594_peerdas.nim:512, universal verification equation)."""
        n = len(cell_indices)
        if not (len(commitments) == len(cells) == len(proofs) == n):
            return None
        if n == 0:
            return True
        if any(i >= CELLS_PER_EXT_BLOB for i in cell_indices):
            return None
        if any(len(c) != BYTES_PER_CELL for c in cells):
            return None
        if any(c is None or len(c) != 48 for c in commitments):
            return None
        if any(p is None or len(p) != 48 for p in proofs):
            return None
        r_mod = self.ctx.r
        F = self.fr
        g1 = self.ctx.g1

        # dedup commitments preserving first-occurrence order (:440)
        unique, cidx = [], []
        for c in commitments:
            if c not in unique:
                unique.append(c)
            cidx.append(unique.index(c))

        (ux, uy), u_inf, u_ok = self.codec.g1_decompress(b"".join(unique))
        (px, py), p_inf, p_ok = self.codec.g1_decompress(b"".join(proofs))
        if not (np.asarray(u_ok).all() and np.asarray(p_ok).all()):
            return None
        cell_scalars = []
        for c in cells:
            s = self._cell_to_scalars(c)
            if s is None:
                return None
            cell_scalars.append(s)

        r = self._batch_challenge(unique, cidx, cell_indices, cells, proofs)
        r_powers = [pow(r, k, r_mod) for k in range(n)]

        # 1. proof_lincomb = sum r^k proof_k
        rl = jnp.asarray(self.ctx.scalars_to_limbs(r_powers))
        proof_lincomb = msm(g1, (px, py), rl, scalar_bits=255)

        # 2. commitment weights
        weights = [0] * len(unique)
        for k in range(n):
            weights[cidx[k]] = (weights[cidx[k]] + r_powers[k]) % r_mod
        wl = jnp.asarray(self.ctx.scalars_to_limbs(weights))
        sum_commitments = msm(g1, (ux, uy), wl, scalar_bits=255)

        # 3. aggregated interpolation polynomial (batched coset iNTTs)
        evals = jnp.asarray(np.stack(cell_scalars))          # (n, 64, L)
        evals = F.to_mont(evals)
        evals_nat = jnp.take(evals, jnp.asarray(self.brp64), axis=1)
        col = self.dom_cell.intt(evals_nat)                  # (n, 64, L)
        # scale coeff j by h_k^-j and weight by r^k
        scale = np.zeros((n, FIELD_ELEMENTS_PER_CELL), dtype=object)
        for k in range(n):
            hinv = pow(self.coset_shifts[cell_indices[k]], -1, r_mod)
            cur = r_powers[k]
            for j in range(FIELD_ELEMENTS_PER_CELL):
                scale[k, j] = cur
                cur = cur * hinv % r_mod
        scale_enc = jnp.asarray(self.fr.encode(
            [int(v) for v in scale.reshape(-1)])).reshape(
                n, FIELD_ELEMENTS_PER_CELL, F.L)
        agg = F.mul(col, scale_enc)
        # sum over k
        while agg.shape[0] > 1:
            h = agg.shape[0] // 2
            head = F.add(agg[:h], agg[h:2 * h])
            agg = (jnp.concatenate([head, agg[2 * h:]], axis=0)
                   if agg.shape[0] % 2 else head)
        agg_canon = F.from_mont(agg[0])                      # (64, L)
        mx, my = self.settings.g1_monomial
        interp_commit = msm(g1, (mx[:64], my[:64]), agg_canon,
                            scalar_bits=255)

        # 4. weighted proofs: scalars r^k * h_k^64
        ws = [r_powers[k] * pow(self.coset_shifts[cell_indices[k]],
                                FIELD_ELEMENTS_PER_CELL, r_mod) % r_mod
              for k in range(n)]
        wsl = jnp.asarray(self.ctx.scalars_to_limbs(ws))
        weighted_proofs = msm(g1, (px, py), wsl, scalar_bits=255)

        final_g1 = g1.add(g1.add(sum_commitments, g1.neg(interp_commit)),
                          weighted_proofs)

        # 5. pairing: e(final_g1, G2) == e(proof_lincomb, [s^64]G2)
        from ..ops.pairing import get_pairing
        pr = get_pairing("BLS12_381")
        g2x, g2y = self.settings.g2_monomial
        (fx, fy), f_inf = g1.to_affine(tuple(t[None] for t in final_g1))
        (lx, ly), l_inf = g1.to_affine(
            tuple(t[None] for t in g1.neg(proof_lincomb)))
        P = (jnp.concatenate([fx, lx]), jnp.concatenate([fy, ly]))
        Q = (jnp.concatenate([g2x[0:1], g2x[64:65]]),
             jnp.concatenate([g2y[0:1], g2y[64:65]]))
        skip = jnp.concatenate([f_inf, l_inf])
        return bool(np.asarray(pr.pairing_check(P, Q, skip_mask=skip)))

    # ------------------------------------------------------------------
    # recovery
    # ------------------------------------------------------------------

    def recover_cells_and_kzg_proofs(self, cell_indices, cells):
        """>= 50% of cells -> all 128 cells + proofs, or None
        (eth_eip7594_peerdas.nim:621, vanishing-poly erasure decoding,
        data_availability_sampling/eth_peerdas.nim:83-132)."""
        n = len(cell_indices)
        if len(cells) != n:
            return None
        if n < CELLS_PER_EXT_BLOB // 2 or n > CELLS_PER_EXT_BLOB:
            return None
        if len(set(cell_indices)) != n:
            return None
        if any(i >= CELLS_PER_EXT_BLOB for i in cell_indices):
            return None
        if any(len(c) != BYTES_PER_CELL for c in cells):
            return None
        F = self.fr
        r_mod = self.ctx.r

        cell_scalars = []
        for c in cells:
            s = self._cell_to_scalars(c)
            if s is None:
                return None
            cell_scalars.append(s)

        if n == CELLS_PER_EXT_BLOB:
            coeffs = self._cells_to_coeffs_full(cell_indices, cell_scalars)
            if coeffs is None:
                return None
        else:
            coeffs = self._recover_coeffs(cell_indices, cell_scalars)
            if coeffs is None:
                return None
        cells_out = self._coeffs_to_cells_bytes(coeffs[:FIELD_ELEMENTS_PER_BLOB])
        # consistency: recovered cells must match provided inputs
        for idx, orig in zip(cell_indices, cells):
            if cells_out[idx] != orig:
                return None
        proofs = self._fk20_proofs(coeffs[:FIELD_ELEMENTS_PER_BLOB])
        (px, py), inf = self.ctx.g1.to_affine(proofs)
        pbytes = self.codec.g1_compress((px, py), np.asarray(inf))
        return cells_out, [pbytes[i * 48:(i + 1) * 48]
                           for i in range(CELLS_PER_EXT_BLOB)]

    def _assemble_ext_brp(self, cell_indices, cell_scalars):
        ext = np.zeros((FIELD_ELEMENTS_PER_EXT_BLOB, self.fr.L), np.uint32)
        for idx, s in zip(cell_indices, cell_scalars):
            ext[idx * 64:(idx + 1) * 64] = s
        return ext

    def _cells_to_coeffs_full(self, cell_indices, cell_scalars):
        ext = self._assemble_ext_brp(cell_indices, cell_scalars)
        evals_brp = self.fr.to_mont(jnp.asarray(ext))
        evals = jnp.take(evals_brp, jnp.asarray(self.brp8192), axis=0)
        coeffs = self.dom_ext.intt(evals)
        # degree must be < 4096
        top = np.asarray(jax.device_get(coeffs[FIELD_ELEMENTS_PER_BLOB:]))
        if top.any():
            return None
        return coeffs

    def _recover_coeffs(self, cell_indices, cell_scalars):
        F = self.fr
        r_mod = self.ctx.r
        missing = [i for i in range(CELLS_PER_EXT_BLOB)
                   if i not in set(cell_indices)]
        # short vanishing poly over missing coset heads^64 (128th roots)
        z_short = [1]
        for i in missing:
            root = pow(self.coset_shifts[i], FIELD_ELEMENTS_PER_CELL, r_mod)
            new = [0] * (len(z_short) + 1)
            for d, cv in enumerate(z_short):
                new[d] = (new[d] - cv * root) % r_mod
                new[d + 1] = (new[d + 1] + cv) % r_mod
            z_short = new
        z_coeffs = np.zeros(FIELD_ELEMENTS_PER_EXT_BLOB, dtype=object)
        for d, cv in enumerate(z_short):
            z_coeffs[d * FIELD_ELEMENTS_PER_CELL] = cv
        zc = jnp.asarray(self.fr.encode([int(v) for v in z_coeffs]))

        ext = self._assemble_ext_brp(cell_indices, cell_scalars)
        e_brp = self.fr.to_mont(jnp.asarray(ext))
        e_nat = jnp.take(e_brp, jnp.asarray(self.brp8192), axis=0)

        z_evals = self.dom_ext.ntt(zc)
        ez_evals = F.mul(e_nat, z_evals)
        ez_coeffs = self.dom_ext.intt(ez_evals)
        # divide on a shifted coset where Z has no zeros
        ez_shift = self.dom_ext.coset_ntt(ez_coeffs, RECOVERY_SHIFT)
        z_shift = self.dom_ext.coset_ntt(zc, RECOVERY_SHIFT)
        q_evals = F.mul(ez_shift, F.batch_inv(z_shift))
        coeffs = self.dom_ext.coset_intt(q_evals, RECOVERY_SHIFT)
        top = np.asarray(jax.device_get(coeffs[FIELD_ELEMENTS_PER_BLOB:]))
        if top.any():
            return None
        return coeffs


@functools.lru_cache(maxsize=None)
def get_peerdas() -> PeerDAS:
    return PeerDAS()
