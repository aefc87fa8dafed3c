"""BW6-761 pairing — embedding degree 6, both G1 and G2 over Fp.

Reference parity: math/pairings/pairings_bw6_761.nim (naive formulation,
millerLoopBW6_761_naive: f = f_{u+1,Q}(P) * Frobenius(f_{u(u^2-u-1),Q}(P)))
with constants from named/constants/bw6_761_pairings.nim.

TPU-native design decisions:
* the Miller loop runs ENTIRELY in Fp6 on the untwisted point psi(Q): line
  values are dense Fp6 elements, batched over pairs. The reference's sparse
  twist-coordinate lines are a CPU micro-optimization; on TPU the batch
  axis dominates and the dense form keeps one code path (the reference
  itself ships this naive formulation as its checked baseline).
* tower: Fp2 = Fp[u]/(u^2 + 4), Fp6 = Fp2[v]/(v^3 - u)  (config
  nonresidue_fp = -4, nonresidue_fp2 = (0,1), M-twist:
  config_fields_and_curves.nim BW6_761 block). The sextic element is v
  (v^6 = -4), twist curve E'/Fp: y^2 = x^3 + 4, untwist
  psi(x', y') = (x' / v^2, y' / v^3).
* final exponentiation: easy part (p^3-1)(p+1) structurally; hard part a
  generic window exponentiation by 3(u^3-u^2+1)(p^2-p+1)/r — the same
  "generic and slow but checked" choice as finalExpHard_BW6_761's exponent
  constant (bw6_761_pairings.nim finalexponent_hard), divisibility
  asserted at build time.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .towers import QuadraticExt, CubicExt
from ..utils import refmath as rm


class BW6Pairing:
    """Optimal ate pairing for BW6-761. Points: G1 = E(Fp): y^2 = x^3 - 1,
    G2 = E'(Fp): y^2 = x^3 + 4 — both with plain Fp affine coordinates
    (x, y) of shape (B, L)."""

    name = "BW6_761"

    def __init__(self, curve_name: str = "BW6_761"):
        from ..named.precompute import get_curve
        assert curve_name == "BW6_761"
        self.ctx = ctx = get_curve(curve_name)
        Fp = ctx.fp
        self.fp = Fp
        p, r = ctx.p, ctx.r
        u = ctx.params.x_param
        self.u = u

        # ---- tower ----------------------------------------------------
        def nr_mul(x):                      # x -> -4x  (u^2 = -4)
            return Fp.neg(Fp.mul_small(x, 4))
        self.fp2 = QuadraticExt(Fp, nonresidue_mul=nr_mul, name="Fp2[BW6]")

        def mul_by_u(x):                    # (a0 + a1 u) * u = -4 a1 + a0 u
            a0 = x[..., 0, :]
            a1 = x[..., 1, :]
            return jnp.stack([Fp.neg(Fp.mul_small(a1, 4)), a0], axis=-2)
        self.fp6 = CubicExt(self.fp2, nonresidue_mul=mul_by_u,
                            name="Fp6[BW6]")

        # ---- untwist constants: 1/v^2 = -u v/4, 1/v^3 = -u/4 ------------
        minv4 = p - pow(4, -1, p)
        self.psi_x = self.fp6.encode([0, 0, 0, minv4, 0, 0])   # c1 = -u/4
        self.psi_y = self.fp6.encode([0, minv4, 0, 0, 0, 0])   # c0 = -u/4
        self.b6 = self.fp6.encode([p - 1, 0, 0, 0, 0, 0])      # E: b = -1

        # ---- Frobenius constants: v^(p^m) = gamma1_m * v,
        #      v^(2 p^m) = gamma2_m * v^2, coefficients conj for odd m ----
        self._gammas = {}
        for m in (1, 2, 3):
            e = (p**m - 1) // 3
            assert (p**m - 1) % 3 == 0
            c = pow(-4, e // 2, p)
            g1 = (0, c) if e % 2 else (c, 0)       # u^e in Fp2
            g2 = (pow(-4, e, p), 0)                # u^(2e) = (-4)^e in Fp
            self._gammas[m] = (self.fp2.encode(list(g1)),
                               self.fp2.encode(list(g2)))

        # ---- Miller loop bit strings (bw6_761_pairings.nim params) -----
        n1 = u + 1                                  # ate_param_1_unopt
        n2 = u * (u * u - u - 1)                    # ate_param_2_unopt
        assert n1 > 0 and n2 > 0
        self.bits1 = np.asarray([int(b) for b in bin(n1)[3:]], np.int32)
        self.bits2 = np.asarray([int(b) for b in bin(n2)[3:]], np.int32)

        # ---- final exp hard part exponent -------------------------------
        assert (p * p - p + 1) % r == 0
        self.hard_exp = (p * p - p + 1) // r * 3 * (u**3 - u**2 + 1)

        # ---- G2 generator (host derivation; the registry pins only G1).
        # The twist E'(Fp): y^2 = x^3 + 4 has order p+1-(t+3f)/2 (the
        # r-divisible sextic-twist order; verified numerically against the
        # curve). Recover the Frobenius trace t from t = p+1 mod r (exact
        # up to a small multiple of r since |t| <= 2 sqrt(p)), then use the
        # TRUE G2 cofactor n2/r. (The reference's integer Cofactor_Eff is
        # tied to its psi-endomorphism clearing formula and is not a plain
        # multiple of the G2 cofactor exponent.)
        import math
        x = 1
        while True:
            x += 1
            y = rm.sqrt_mod((x**3 - 1) % p, p)
            if y:                       # skip non-residues AND 2-torsion
                break
        P1 = (x, y)
        t0 = (p + 1) % r
        t = None
        for k in range(-40, 40):
            cand = t0 + k * r
            if abs(cand) > 2 * math.isqrt(p) + 2:
                continue
            if rm.ec_mul(p + 1 - cand, P1, 0, p) is None:
                t = cand
                break
        assert t is not None, "BW6-761 trace recovery failed"
        f2, rem = divmod(4 * p - t * t, 3)
        assert rem == 0
        f = math.isqrt(f2)
        assert f * f == f2
        n2 = p + 1 - (t + 3 * f) // 2
        assert n2 % r == 0, "twist order not r-divisible"
        h2 = n2 // r
        x = 0
        while True:
            x += 1
            y = rm.sqrt_mod((x**3 + 4) % p, p)
            if not y:
                continue
            g2 = rm.ec_mul(h2, (x, min(y, p - y)), 0, p)
            if g2 is not None and rm.ec_mul(r, g2, 0, p) is None:
                self.g2_gen_int = g2
                break

        self.miller_loop = jax.jit(self.miller_loop)
        self.final_exp = jax.jit(self.final_exp)

    # ------------------------------------------------------------------
    # Fp6 helpers
    # ------------------------------------------------------------------

    def _smul(self, s, v):
        """Fp scalar s (..., L) times Fp6 element v (..., 6, L)."""
        return self.fp.mul(v, s[..., None, :])

    def frobenius(self, f, power: int = 1):
        """f^(p^power), power in {1, 2, 3}: Fp2-conjugate the coefficients
        for odd powers, then multiply by the v-basis gamma constants."""
        fp2 = self.fp2
        g1, g2 = self._gammas[power]
        c0 = f[..., 0:2, :]
        c1 = f[..., 2:4, :]
        c2 = f[..., 4:6, :]
        if power % 2 == 1:
            c0, c1, c2 = fp2.conj(c0), fp2.conj(c1), fp2.conj(c2)
        c1 = fp2.mul(c1, jnp.broadcast_to(jnp.asarray(g1), c1.shape))
        c2 = fp2.mul(c2, jnp.broadcast_to(jnp.asarray(g2), c2.shape))
        return jnp.concatenate([c0, c1, c2], axis=-2)

    def psi(self, q_aff):
        """Untwist E'(Fp) -> E(Fp6): (x', y') -> (x'/v^2, y'/v^3)."""
        xQ, yQ = q_aff
        px = jnp.broadcast_to(jnp.asarray(self.psi_x),
                              xQ.shape[:-1] + (6, xQ.shape[-1]))
        py = jnp.broadcast_to(jnp.asarray(self.psi_y),
                              yQ.shape[:-1] + (6, yQ.shape[-1]))
        return self._smul(xQ, px), self._smul(yQ, py)

    # ------------------------------------------------------------------
    # Miller steps (projective, a=0, b=-1, all in Fp6 — same algebra as
    # the k=12 fused steps in ops/pairing.py, dense lines)
    # ------------------------------------------------------------------

    def _dbl_step(self, T, xP, yP):
        f6 = self.fp6
        X, Y, Z = T
        b6 = jnp.broadcast_to(jnp.asarray(self.b6), X.shape)
        B = f6.square(Y)
        C = f6.square(Z)
        E = f6.mul_small(f6.mul(b6, C), 3)
        F3 = f6.mul_small(E, 3)
        A = self.fp.div2(f6.mul(X, Y))
        G = self.fp.div2(f6.add(B, F3))
        H = f6.sub(f6.sub(f6.square(f6.add(Y, Z)), B), C)      # 2YZ
        X3 = f6.mul(A, f6.sub(B, F3))
        Y3 = f6.sub(f6.square(G), f6.mul_small(f6.square(E), 3))
        Z3 = f6.mul(B, H)
        XX = f6.square(X)
        sA = f6.mul(H, Z)                                       # 2YZ^2
        sC = f6.sub(f6.mul(f6.mul_small(XX, 3), X),
                    f6.mul(f6.add(B, B), Z))                    # 3X^3-2Y^2Z
        sB = f6.neg(f6.mul(f6.mul_small(XX, 3), Z))             # -3X^2 Z
        l = f6.add(f6.add(self._smul(yP, sA), self._smul(xP, sB)), sC)
        return (X3, Y3, Z3), l

    def _add_step(self, T, Q, xP, yP):
        f6 = self.fp6
        X, Y, Z = T
        xQ, yQ = Q                                   # Fp6 affine (untwisted)
        theta = f6.sub(Y, f6.mul(yQ, Z))
        lam = f6.sub(X, f6.mul(xQ, Z))
        t2 = f6.square(theta)
        l2 = f6.square(lam)
        l3c = f6.mul(l2, lam)
        H = f6.add(f6.sub(f6.mul(t2, Z), f6.mul_small(f6.mul(l2, X), 2)),
                   l3c)
        X3 = f6.mul(lam, H)
        Y3 = f6.sub(f6.mul(theta, f6.sub(f6.mul(l2, X), H)),
                    f6.mul(Y, l3c))
        Z3 = f6.mul(l3c, Z)
        sA = lam
        sC = f6.sub(f6.mul(theta, xQ), f6.mul(lam, yQ))
        sB = f6.neg(theta)
        l = f6.add(f6.add(self._smul(yP, sA), self._smul(xP, sB)), sC)
        return (X3, Y3, Z3), l

    def _basic_miller(self, bits, qpsi, xP, yP):
        """Plain double-and-add Miller loop over a fixed positive bit
        string (basicMillerLoop, miller_loops.nim:42)."""
        f6 = self.fp6
        batch = xP.shape[:-1]
        xQ, yQ = qpsi
        T = (xQ, yQ, f6.broadcast_one(batch))
        f = f6.broadcast_one(batch)

        def body(state, bit):
            f_, T_ = state
            f_ = f6.square(f_)
            T_, l = self._dbl_step(T_, xP, yP)
            f_ = f6.mul(f_, l)
            T_add, l_add = self._add_step(T_, (xQ, yQ), xP, yP)
            f_add = f6.mul(f_, l_add)
            take = (bit == 1) & jnp.ones(batch, bool)
            f_ = f6.cselect(take, f_add, f_)
            T_ = tuple(f6.cselect(take, a, b) for a, b in zip(T_add, T_))
            return (f_, T_), None

        (f, _), _ = jax.lax.scan(body, (f, T), jnp.asarray(bits))
        return f

    def miller_loop(self, p_aff, q_aff):
        """f_{u+1,Q}(P) * pi(f_{u(u^2-u-1),Q}(P)), batched over pairs."""
        xP, yP = p_aff
        qpsi = self.psi(q_aff)
        f1 = self._basic_miller(self.bits1, qpsi, xP, yP)
        f2 = self._basic_miller(self.bits2, qpsi, xP, yP)
        return self.fp6.mul(f1, self.frobenius(f2, 1))

    # ------------------------------------------------------------------
    # final exponentiation
    # ------------------------------------------------------------------

    def final_exp(self, f):
        """f^((p^6-1)/r * 3(u^3-u^2+1)): easy part (p^3-1)(p+1)
        structurally, hard part by generic window exponentiation."""
        f6 = self.fp6
        f = f6.mul(self.frobenius(f, 3), f6.inv(f))    # ^(p^3 - 1)
        f = f6.mul(self.frobenius(f, 1), f)            # ^(p + 1)
        return f6.pow_const(f, self.hard_exp)

    # ------------------------------------------------------------------
    # public API (mirrors ops/pairing.py)
    # ------------------------------------------------------------------

    def pairing(self, p_aff, q_aff):
        return self.final_exp(self.miller_loop(p_aff, q_aff))

    def multi_pairing(self, p_aff, q_aff, skip_mask=None):
        f6 = self.fp6
        fs = self.miller_loop(p_aff, q_aff)
        if skip_mask is not None:
            fs = f6.cselect(skip_mask, f6.broadcast_one(fs.shape[:-2]), fs)
        while fs.shape[0] > 1:
            h = fs.shape[0] // 2
            head = f6.mul(fs[:h], fs[h:2 * h])
            fs = (jnp.concatenate([head, fs[2 * h:]], axis=0)
                  if fs.shape[0] % 2 else head)
        return self.final_exp(fs[0])

    def pairing_check(self, p_aff, q_aff, skip_mask=None):
        gt = self.multi_pairing(p_aff, q_aff, skip_mask)
        return self.fp6.eq(gt, self.fp6.broadcast_one(()))


@functools.lru_cache(maxsize=None)
def get_bw6_pairing() -> BW6Pairing:
    return BW6Pairing()
