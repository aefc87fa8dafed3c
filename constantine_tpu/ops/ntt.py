"""Number-theoretic transform (radix-2 FFT over Fr) — batched, TPU-native.

Re-design of the reference's field FFT
(constantine/math/polynomials/fft_fields.nim:34-436: FrFFT_Descriptor with
precomputed root powers, recursive + iterative DIF/DIT + Stockham autosort,
and the bit-reversal permutations in fft_common.nim:92-190). On TPU:

* the bit-reversal permutation is ONE precomputed gather (host-built index
  table) instead of the cache-oblivious COBRA dance — HBM gathers are cheap
  relative to the butterfly muls;
* each butterfly stage is a full-array reshape + one batched field mul +
  add/sub pair, so the whole transform is log2(N) fused vector stages;
* coset (shifted-domain) variants premultiply by host-precomputed shift
  power tables (fft_fields.nim:597-719 coset_fft analogue).

Also provides the polynomial-domain helpers the KZG/EIP-4844 protocol layer
needs (domains in bit-reversed order, inverse transforms).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.field import Field


def bit_reversal_perm(n: int) -> np.ndarray:
    """Bit-reversal index table for size n = 2^k (fft_common.nim:92)."""
    k = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


class NTTDomain:
    """Radix-2 evaluation domain of size 2^log_n over a scalar field.

    Holds host-precomputed twiddle tables (Montgomery form) per stage for
    forward/inverse transforms — the analogue of FrFFT_Descriptor's rootz
    arrays (fft_fields.nim:34-54).
    """

    def __init__(self, F: Field, omega: int, log_n: int):
        self.F = F
        self.log_n = log_n
        self.n = 1 << log_n
        self.omega = omega
        p = F.p_int
        assert pow(omega, self.n, p) == 1
        assert pow(omega, self.n // 2, p) != 1 or self.n == 1

        w_pows = [1] * (self.n // 2 + 1)
        for i in range(1, self.n // 2 + 1):
            w_pows[i] = w_pows[i - 1] * omega % p
        wi = pow(omega, -1, p)
        wi_pows = [1] * (self.n // 2 + 1)
        for i in range(1, self.n // 2 + 1):
            wi_pows[i] = wi_pows[i - 1] * wi % p

        # stage s (m = 2^(s+1)) twiddles: omega_N^{(N/m) * k}, k < m/2
        self.tw_fwd = []
        self.tw_inv = []
        for s in range(log_n):
            m = 1 << (s + 1)
            stride = self.n // m
            ks = np.arange(m // 2)
            self.tw_fwd.append(jnp.asarray(
                F.encode([w_pows[stride * int(k)] for k in ks])))
            self.tw_inv.append(jnp.asarray(
                F.encode([wi_pows[stride * int(k)] for k in ks])))

        self.brp = jnp.asarray(bit_reversal_perm(self.n))
        self.n_inv = jnp.asarray(F.encode([pow(self.n, -1, p)]))[0]
        # full domain in natural order (for barycentric eval etc.)
        self.domain_int = [pow(omega, i, p) for i in range(self.n)]

        self._fwd = jax.jit(functools.partial(self._transform, inverse=False))
        self._inv = jax.jit(functools.partial(self._transform, inverse=True))

    # -- core transform -----------------------------------------------------

    def _transform(self, x, inverse: bool):
        """Iterative DIT over the LAST batch axis... x: (..., n, L) Montgomery.
        Natural order in, natural order out."""
        F = self.F
        n = self.n
        batch = x.shape[:-2]
        y = jnp.take(x, self.brp, axis=-2)
        tws = self.tw_inv if inverse else self.tw_fwd
        for s in range(self.log_n):
            m = 1 << (s + 1)
            y = y.reshape(batch + (n // m, 2, m // 2, F.L))
            a = y[..., 0, :, :]
            b = y[..., 1, :, :]
            t = F.mul(b, tws[s])         # broadcast (m/2, L) over batch
            y = jnp.concatenate([F.add(a, t)[..., None, :, :],
                                 F.sub(a, t)[..., None, :, :]], axis=-3)
            y = y.reshape(batch + (n, F.L))
        # fold the pair axis properly: above concat puts (lo, hi) adjacent
        # per block, which reshape restores to [lo | hi] block layout.
        if inverse:
            y = F.mul(y, self.n_inv)
        return y

    # -- fused-kernel path (four-step planar butterflies in Pallas) -----------
    #
    # Bailey four-step over planar (L, n1, n2) with n2 on the 128-lane axis:
    # every butterfly slices the MIDDLE axis (>= n2-lane contiguous moves —
    # small-stride lane shuffles were the whole cost of the naive stage
    # loop), with ONE planar transpose between the column and row passes.
    # Butterflies run as fused Pallas kernels (mul+add+sub in VMEM).

    def _four_step_tables(self, inverse: bool):
        key = "_fs_inv" if inverse else "_fs_fwd"
        if getattr(self, key, None) is None:
            F, p, n = self.F, self.F.p_int, self.n
            log1 = self.log_n // 2
            n1 = 1 << log1
            n2 = n // n1
            w = pow(self.omega, -1, p) if inverse else self.omega

            def stage_planes(wsub, nsub, lanes):
                # per-stage twiddle planes (L, nsub/2 * lanes) for a
                # middle-axis transform of size nsub broadcast over `lanes`
                planes = []
                logs = nsub.bit_length() - 1
                for s in range(logs):
                    m = 1 << (s + 1)
                    ks = [pow(wsub, (nsub // m) * k, p) for k in range(m // 2)]
                    t = np.asarray(F.encode(ks)).T          # (L, m/2)
                    t = np.repeat(t, lanes, axis=1)         # (L, m/2*lanes)
                    planes.append(jnp.asarray(
                        np.tile(t, (1, nsub // m))))        # (L, nsub/2*lanes)
                return planes

            w1 = pow(w, n2, p)                              # order n1
            w2 = pow(w, n1, p)                              # order n2
            col = stage_planes(w1, n1, n2)
            row = stage_planes(w2, n2, n1)
            # twiddle matrix omega^(k1*i2), planar (L, n1, n2)
            tw = np.empty((n1, n2), dtype=object)
            for k1 in range(n1):
                base = pow(w, k1, p)
                cur = 1
                for i2 in range(n2):
                    tw[k1][i2] = cur
                    cur = cur * base % p
            twm = jnp.asarray(np.asarray(
                F.encode(list(tw.reshape(-1)))).T.reshape(F.L, n1, n2))
            brp1 = jnp.asarray(bit_reversal_perm(n1))
            brp2 = jnp.asarray(bit_reversal_perm(n2))
            setattr(self, key, (n1, n2, col, row, twm, brp1, brp2))
        return getattr(self, key)

    def _bfly(self, pec, a, b, plane):
        ins, np_ = pec._pad([a, b, plane], a.shape[1])

        def body(kf, v, _d):
            t = kf.mul(v[1], v[2])
            return kf.add(v[0], t), kf.sub(v[0], t)

        f = pec._elemwise("ntt_bfly", 3, 2, body, np_)
        ss, dd = f(*ins, pec._consts)
        return ss[:, :a.shape[1]], dd[:, :a.shape[1]]

    def _mid_axis_ntt(self, pec, y, planes, brp):
        """DIT transform along axis 1 of planar (L, ns, lanes)."""
        L, ns, lanes = y.shape
        y = jnp.take(y, brp, axis=1)
        for s, plane in enumerate(planes):
            m = 1 << (s + 1)
            h = m // 2
            xr = y.reshape(L, ns // m, m, lanes)
            a = xr[:, :, :h, :].reshape(L, ns // 2 * lanes)
            b = xr[:, :, h:, :].reshape(L, ns // 2 * lanes)
            ss, dd = self._bfly(pec, a, b, plane)
            y = jnp.concatenate(
                [ss.reshape(L, ns // m, h, lanes),
                 dd.reshape(L, ns // m, h, lanes)], axis=2).reshape(
                     L, ns, lanes)
        return y

    def _transform_pallas(self, x, inverse: bool):
        from .pallas_ec import get_pallas_ec
        F = self.F
        n, L = self.n, F.L
        pec = get_pallas_ec(F)
        n1, n2, col, row, twm, brp1, brp2 = self._four_step_tables(inverse)
        y = x.T.reshape(L, n1, n2)                    # i = i1*n2 + i2
        y = self._mid_axis_ntt(pec, y, col, brp1)     # column NTTs (size n1)
        ins, np_ = pec._pad([y.reshape(L, n), twm.reshape(L, n)], n)
        f = pec._elemwise("ntt_twm", 2, 1,
                          lambda kf, v, _d: (kf.mul(v[0], v[1]),), np_)
        y = f(*ins, pec._consts)[0][:, :n].reshape(L, n1, n2)
        y = y.transpose(0, 2, 1)                      # (L, n2, n1)
        y = self._mid_axis_ntt(pec, y, row, brp2)     # row NTTs (size n2)
        y = y.reshape(L, n).T                         # k = k2*n1 + k1
        if inverse:
            y = F.mul(y, self.n_inv)
        return y

    def _use_pallas(self, x) -> bool:
        import os
        if os.environ.get("CTT_NTT_PALLAS") == "0":
            return False
        return (x.ndim == 2 and self.n >= 1024
                and (jax.default_backend() != "cpu"
                     or os.environ.get("CTT_NTT_PALLAS") == "1"))

    def ntt(self, x):
        """Forward NTT, natural -> natural (fft_nn analogue,
        fft_fields.nim:532)."""
        if self._use_pallas(x):
            self._four_step_tables(False)   # host-build before tracing
            if getattr(self, "_fwd_pl", None) is None:
                self._fwd_pl = jax.jit(functools.partial(
                    self._transform_pallas, inverse=False))
            return self._fwd_pl(x)
        return self._fwd(x)

    def intt(self, x):
        """Inverse NTT, natural -> natural (ifft_nn, fft_fields.nim:563)."""
        if self._use_pallas(x):
            self._four_step_tables(True)    # host-build before tracing
            if getattr(self, "_inv_pl", None) is None:
                self._inv_pl = jax.jit(functools.partial(
                    self._transform_pallas, inverse=True))
            return self._inv_pl(x)
        return self._inv(x)

    def brp_permute(self, x):
        """Bit-reversal permute along the element axis (axis -2)."""
        return jnp.take(x, self.brp, axis=-2)

    # -- coset (shifted-domain) transforms -----------------------------------
    # Analogue of the reference's coset FFT/iFFT with shift/unshift
    # (fft_fields.nim:597-719). Shift power tables are host-precomputed per
    # shift value and cached.

    @functools.lru_cache(maxsize=8)
    def _shift_powers(self, shift: int, inverse: bool):
        p = self.F.p_int
        s = pow(shift, -1, p) if inverse else shift
        pows, cur = [], 1
        for _ in range(self.n):
            pows.append(cur)
            cur = cur * s % p
        return jnp.asarray(self.F.encode(pows))

    def coset_ntt(self, coeffs, shift: int):
        """Evaluate poly (coeff form) on the coset shift * <omega>:
        scale coeff_i by shift^i, then NTT."""
        scaled = self.F.mul(coeffs, self._shift_powers(shift, False))
        return self._fwd(scaled)

    def coset_intt(self, evals, shift: int):
        """Inverse: interpolate over the coset, return coeffs."""
        coeffs = self._inv(evals)
        return self.F.mul(coeffs, self._shift_powers(shift, True))


@functools.lru_cache(maxsize=None)
def get_domain(curve_name: str, log_n: int) -> NTTDomain:
    from ..named.precompute import get_curve
    ctx = get_curve(curve_name)
    omega = ctx.root_of_unity(log_n)
    return NTTDomain(ctx.fr, omega, log_n)
