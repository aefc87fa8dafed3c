"""Polynomials over a scalar field — coefficient and evaluation forms.

Reference parity: math/polynomials/polynomials.nim — PolynomialCoef /
PolynomialEval with natural vs bit-reversed (kBitReversed) ordering,
barycentric evalPolyAt in/off domain (polynomials.nim:384-446), polynomial
division by a linear factor (getQuotientPoly machinery), vanishing
polynomials (polynomials.nim:446-502), the Lagrange basis (polynomials.nim:551)
and inverseDifferenceArray (polynomials.nim:288).

TPU-native design: everything batched over the element axis; the only
sequential structures are Horner evaluation and synthetic division, which
run as `lax.scan` over coefficients (n steps of O(1) field ops — these are
inherently sequential recurrences; the batch axis is the parallel axis).
Divisions use ONE Montgomery batch inversion (field.batch_inv) per call.

All values are Montgomery-form limb arrays (..., n, L) unless noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .field import Field
from .ntt import NTTDomain


class PolyOps:
    """Polynomial operations bound to an evaluation domain.

    `coef` arrays are (..., n, L) coefficients c_0..c_{n-1} (low first);
    `evals` arrays are values on the domain, natural or brp order.
    """

    def __init__(self, domain: NTTDomain):
        self.dom = domain
        self.F: Field = domain.F
        self.n = domain.n
        # domain in natural order, Montgomery form (device constant)
        self.roots = jnp.asarray(self.F.encode(domain.domain_int))
        self.roots_brp = jnp.take(self.roots, domain.brp, axis=0)

    # -- conversions ---------------------------------------------------------

    def coef_to_eval(self, coef, brp: bool = False):
        ev = self.dom.ntt(coef)
        return self.dom.brp_permute(ev) if brp else ev

    def eval_to_coef(self, evals, brp: bool = False):
        if brp:
            evals = self.dom.brp_permute(evals)   # brp is an involution
        return self.dom.intt(evals)

    # -- evaluation ----------------------------------------------------------

    def eval_coef_at(self, coef, z):
        """Horner evaluation of coefficient form at z (batched over z's
        leading axes; coef (n, L), z (..., L))."""
        F = self.F

        def step(acc, c):
            return F.add(F.mul(acc, z), jnp.broadcast_to(c, z.shape)), None

        acc = F.broadcast_zero(z.shape[:-1])
        acc, _ = jax.lax.scan(step, acc, coef[::-1])
        return acc

    def inverse_difference_array(self, z, brp: bool = False):
        """1/(z - w_i) for every domain root w_i, with the in-domain pole
        masked to 0 (inverseDifferenceArray, polynomials.nim:288).
        z: one point, (L,). Returns (inv_diffs (n, L), in_domain (n,) bool);
        batch over z with jax.vmap."""
        F = self.F
        roots = self.roots_brp if brp else self.roots
        diffs = F.sub(jnp.broadcast_to(z, roots.shape), roots)
        in_dom = F.is_zero(diffs)
        safe = F.cselect(in_dom, F.broadcast_one(diffs.shape[:-1]), diffs)
        return F.cselect(in_dom, F.broadcast_zero(diffs.shape[:-1]),
                         F.batch_inv(safe)), in_dom

    def eval_lagrange_at(self, evals, z, brp: bool = False):
        """Barycentric evaluation of evaluation form at one point z (L,)
        (evalPolyAt/evalPolyOffDomainAt, polynomials.nim:384-446):
        p(z) = (z^n - 1)/n * sum_i e_i * w_i / (z - w_i), with the
        in-domain case (z == w_j -> p(z) = e_j) resolved by masking."""
        F = self.F
        roots = self.roots_brp if brp else self.roots
        invd, in_dom = self.inverse_difference_array(z, brp)
        terms = F.mul(F.mul(evals, roots), invd)
        s = _tree_sum(F, terms)
        zn = F.pow_const(z, self.n)
        factor = F.mul(F.sub(zn, F.broadcast_one(())), self.dom.n_inv)
        off = F.mul(factor, s)
        # in-domain: select the matching evaluation (cselect broadcasts the
        # condition over the limb axis itself)
        on = _tree_sum(F, F.cselect(in_dom, evals,
                                    F.broadcast_zero(evals.shape[:-1])))
        return F.cselect(jnp.any(in_dom), on, off)

    def lagrange_basis_at(self, z, brp: bool = False):
        """All n Lagrange basis polynomials evaluated at one point z (L,)
        (polynomials.nim:551): L_i(z) = w_i (z^n - 1) / (n (z - w_i))."""
        F = self.F
        roots = self.roots_brp if brp else self.roots
        invd, in_dom = self.inverse_difference_array(z, brp)
        zn = F.pow_const(z, self.n)
        factor = F.mul(F.sub(zn, F.broadcast_one(())), self.dom.n_inv)
        off = F.mul(F.mul(roots, invd), jnp.broadcast_to(factor, roots.shape))
        one = F.broadcast_one(in_dom.shape)
        zero = F.broadcast_zero(in_dom.shape)
        return F.cselect(jnp.any(in_dom),
                         F.cselect(in_dom, one, zero), off)

    # -- division ------------------------------------------------------------

    def div_by_linear(self, coef, z):
        """(p(X) - p(z)) / (X - z) by synthetic (Ruffini) division — the
        off-domain quotient-poly core (protocol_quotient_check.nim:23-167).
        Returns (quotient coeffs (n, L) with top coeff 0, remainder p(z))."""
        F = self.F

        def step(acc, c):
            # descending coefficients: q_i = c_{i+1} + z * q_{i+1}
            nxt = F.add(c, F.mul(acc, z))
            return nxt, acc

        acc = F.broadcast_zero(z.shape[:-1] if z.ndim > 1 else ())
        acc, qs_desc = jax.lax.scan(step, acc, coef[::-1])
        # qs_desc[k] is the accumulator BEFORE absorbing coef[n-1-k], i.e.
        # quotient coefficient q_{n-1-k} (with qs_desc[0] = 0 standing in
        # for the vanished degree-(n-1) slot); reversing gives ascending
        # order with the top coefficient 0.
        return qs_desc[::-1], acc

    # -- vanishing polynomials -------------------------------------------------

    def vanishing_poly_from_roots(self, roots_mont):
        """Coefficients of prod_j (X - r_j) (vanishingPoly,
        polynomials.nim:446-502). Sequential in the number of roots m
        (each step is one shifted multiply-accumulate over the m+1
        coefficients); roots_mont: (m, L). Returns (m+1, L)."""
        F = self.F
        m = roots_mont.shape[0]
        out = jnp.zeros((m + 1,) + roots_mont.shape[1:], roots_mont.dtype)
        out = out.at[0].set(F.broadcast_one(()))

        def step(acc, r):
            shifted = jnp.roll(acc, 1, axis=0).at[0].set(
                F.broadcast_zero(()))
            return F.sub(shifted, F.mul(acc, r)), None

        out, _ = jax.lax.scan(step, out, roots_mont)
        return out

    def eval_vanishing_coset_at(self, shift_pow_m, z, m: int):
        """Z_coset(z) = z^m - shift^m for the size-m coset shift*<w^m>
        (the PeerDAS erasure-recovery vanishing form,
        data_availability_sampling/eth_peerdas.nim:83-132)."""
        F = self.F
        return F.sub(F.pow_const(z, m), shift_pow_m)

    # -- arithmetic ------------------------------------------------------------

    def add(self, a, b):
        return self.F.add(a, b)

    def sub(self, a, b):
        return self.F.sub(a, b)

    def scale(self, a, k):
        return self.F.mul(a, k)

    def mul_coef(self, a, b, out_domain: "PolyOps" = None):
        """Coefficient-form product via NTT on a 2x domain. a, b: (n, L)
        with combined degree < 2n; `out_domain` must be the 2n PolyOps
        (callers hold both sizes — domains are cheap, host-precomputed)."""
        assert out_domain is not None and out_domain.n == 2 * self.n
        F = self.F
        pad = ((0, self.n), (0, 0))
        ea = out_domain.dom.ntt(jnp.pad(a, pad))
        eb = out_domain.dom.ntt(jnp.pad(b, pad))
        return out_domain.dom.intt(F.mul(ea, eb))


def _tree_sum(F, arr, axis: int = -2):
    """Log-depth field sum along `axis` (default the element axis)."""
    n = arr.shape[axis]
    while n > 1:
        h = n // 2
        lo = jax.lax.slice_in_dim(arr, 0, h, axis=axis)
        hi = jax.lax.slice_in_dim(arr, h, 2 * h, axis=axis)
        s = F.add(lo, hi)
        if n % 2:
            tail = jax.lax.slice_in_dim(arr, 2 * h, n, axis=axis)
            arr = jnp.concatenate([s, tail], axis=axis)
        else:
            arr = s
        n = h + (n % 2)
    return jnp.squeeze(arr, axis=axis)
