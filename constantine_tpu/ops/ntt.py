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

    def ntt(self, x):
        """Forward NTT, natural -> natural (fft_nn analogue,
        fft_fields.nim:532)."""
        return self._fwd(x)

    def intt(self, x):
        """Inverse NTT, natural -> natural (ifft_nn, fft_fields.nim:563)."""
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
