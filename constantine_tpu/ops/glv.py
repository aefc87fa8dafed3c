"""GLV/GLS endomorphism-accelerated scalar decomposition — batched.

Re-design of the reference's endomorphism stack
(constantine/math/endomorphisms/split_scalars.nim:95-125 decomposeEndo via
precomputed lattice + Babai rounding, :222-399 GLV-SAC recoding;
constantine/math/elliptic/ec_scalar_mul.nim:267 scalarMulEndo;
ec_multi_scalar_mul.nim:398-434 applyEndomorphism MSM pre-split) for TPU:

* For j-invariant-0 curves (a = 0: BLS12, BN, secp256k1, Pasta) the curve
  has the cheap endomorphism  phi(x, y) = (beta*x, y)  with  phi(P) =
  [lambda]P,  beta/lambda primitive cube roots of unity in Fp/Fr.
* Lattice basis: 2D Gauss reduction of span{(r, 0), (-lambda, 1)} at
  registry-build time (host ints) — the analogue of the reference's
  compile-time zoo constants (named/constants/*_endomorphisms.nim).
* Babai rounding ON DEVICE, batched and branchless: c_i = round(k * b_i / r)
  is computed as a Barrett product with a 2^384-scaled constant (the error
  is < 2^-120, absorbed by one spare bit in the mini-scalars), and the
  mini-scalars  k1 = k - c1 a1 - c2 a2,  k2 = -(c1 b1 + c2 b2)  are evaluated
  in two's-complement over 16-bit limbs so the (host-known) signs of the
  basis never branch. Signs come out as lane masks that fold into point
  negation — exactly how the MSM already consumes signed digits.

Decomposition halves the scalar bit-length (255 -> ~128): a CT scalar mul
does half the doublings; an MSM halves its bucket count and window-combine
doubling chain.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs as lb
from .limbs import MASK, WORD_BITS
from ..utils import refmath as rm

_BARRETT_BITS = 384                  # scale for the rounding constants
_BARRETT_LIMBS = _BARRETT_BITS // WORD_BITS


def _gauss_reduce(u, v):
    """Gauss lattice reduction of a 2D basis (python ints).

    Returns a reduced (shortest) basis of the same lattice — the host-side
    analogue of the reference's precomputed lattice constants."""
    def norm2(w):
        return w[0] * w[0] + w[1] * w[1]
    if norm2(u) < norm2(v):
        u, v = v, u
    while True:
        # round(<u,v>/<v,v>)
        num = u[0] * v[0] + u[1] * v[1]
        den = norm2(v)
        m = (2 * num + den) // (2 * den)  # round-half-up for positives
        u = (u[0] - m * v[0], u[1] - m * v[1])
        if norm2(u) >= norm2(v):
            return v, u
        u, v = v, u


def cube_roots_of_unity(m: int):
    """Non-trivial cube roots of unity mod m (requires m ≡ 1 mod 3)."""
    if m % 3 != 1:
        return None
    s = rm.sqrt_mod((-3) % m, m)
    if s is None:
        return None
    inv2 = rm.inv_mod(2, m)
    r1 = (m - 1 + s) * inv2 % m
    return r1, (m - 1 - s) * inv2 % m


class GLV:
    """Degree-2 GLV decomposition context for a j=0 short-Weierstrass curve.

    Built from a CurveCtx; raises ValueError if the curve has no usable
    endomorphism (a != 0 or no cube roots of unity)."""

    def __init__(self, ctx):
        if ctx.a != 0:
            raise ValueError(f"{ctx.name}: GLV needs j-invariant 0 (a = 0)")
        lams = cube_roots_of_unity(ctx.r)
        betas = cube_roots_of_unity(ctx.p)
        if lams is None or betas is None:
            raise ValueError(f"{ctx.name}: no cube roots of unity")
        self.ctx = ctx
        r = ctx.r

        # match beta <-> lambda on the generator: (beta*gx, gy) == [lam]G
        gx, gy = ctx.g
        self.lam = self.beta = None
        for lam in lams:
            target = rm.ec_mul(lam, ctx.g, 0, ctx.p)
            for beta in betas:
                if target == (beta * gx % ctx.p, gy):
                    self.lam, self.beta = lam, beta
        assert self.lam is not None, f"{ctx.name}: beta/lambda mismatch"

        # short basis of {(a, b): a + b*lam ≡ 0 mod r}
        v1, v2 = _gauss_reduce((r, 0), ((-self.lam) % r, 1))
        self.basis = (v1, v2)
        (a1, b1), (a2, b2) = v1, v2
        det = a1 * b2 - a2 * b1
        assert abs(det) == r, "basis does not span the GLV lattice"
        if det < 0:                      # normalize det to +r
            v2 = (-a2, -b2)
            a2, b2 = v2
            self.basis = (v1, v2)

        # Babai rounding constants: c1 = round(k*b2/r), c2 = round(-k*b1/r).
        # Scaled by 2^384 so the device computes them as one wide product +
        # shift; signs of b1/b2 are folded in on host so W1, W2 >= 0 and the
        # device c's are non-negative (their sign is re-applied through the
        # two's-complement constants below).
        B = 1 << _BARRETT_BITS
        self.w1 = (abs(b2) * B + r // 2) // r
        self.s1 = -1 if b2 < 0 else 1             # sign of c1's coefficient
        self.w2 = (abs(b1) * B + r // 2) // r
        self.s2 = 1 if b1 < 0 else -1             # c2 = round(k * (-b1) / r)

        # mini-scalar magnitude bound -> limb/bit sizing (one bit of slack
        # for the Barrett rounding error)
        maxv = max(abs(x) for x in (a1, b1, a2, b2))
        self.mini_bits = maxv.bit_length() + 2
        self.LM = lb.num_limbs(self.mini_bits + WORD_BITS)  # 1 spare limb
        W = 1 << (WORD_BITS * self.LM)
        # two's-complement encodings of the update constants, mod 2^(16*LM):
        #   k1 = k - c1*(s1*a1) - c2*(s2*a2)
        #   k2 =   - c1*(s1*b1) - c2*(s2*b2)
        self.m_a1 = lb.int_to_limbs((self.s1 * a1) % W, self.LM)
        self.m_a2 = lb.int_to_limbs((self.s2 * a2) % W, self.LM)
        self.m_b1 = lb.int_to_limbs((self.s1 * b1) % W, self.LM)
        self.m_b2 = lb.int_to_limbs((self.s2 * b2) % W, self.LM)
        self.w1_limbs = lb.int_to_limbs(self.w1, lb.num_limbs(self.w1.bit_length()))
        self.w2_limbs = lb.int_to_limbs(self.w2, lb.num_limbs(self.w2.bit_length()))

        self.beta_mont = ctx.fp.encode([self.beta])[0]
        self._validate()
        self.decompose = jax.jit(self.decompose)

    # -- host-side validation (analogue of the reference's sage checks) ------

    def _validate(self):
        import random
        rng = random.Random(0x61F5)
        r = self.ctx.r
        for _ in range(64):
            k = rng.randrange(r)
            k1, k2 = self._decompose_host(k)
            assert (k1 + k2 * self.lam - k) % r == 0, "GLV decomposition broken"
            assert max(abs(k1), abs(k2)) < (1 << self.mini_bits), \
                "mini-scalar exceeds bound"

    def _decompose_host(self, k: int):
        """Reference decomposition with python ints (same rounding path as
        the device code, for differential testing)."""
        B = 1 << _BARRETT_BITS
        c1 = (k * self.w1 + B // 2) >> _BARRETT_BITS
        c2 = (k * self.w2 + B // 2) >> _BARRETT_BITS
        (a1, b1), (a2, b2) = self.basis
        k1 = k - c1 * (self.s1 * a1) - c2 * (self.s2 * a2)
        k2 = -c1 * (self.s1 * b1) - c2 * (self.s2 * b2)
        return k1, k2

    # -- device path ----------------------------------------------------------

    def decompose(self, scalars):
        """(N, Ls) canonical scalar limbs -> (k1, neg1, k2, neg2).

        k1/k2: (N, LM) canonical limb magnitudes (< 2^mini_bits);
        neg1/neg2: (N,) bool lane masks (fold into point negation).
        Branchless; one fused trace (the decomposeEndo analogue)."""
        c1 = _mul_const_shift(scalars, self.w1_limbs, _BARRETT_LIMBS, self.LM)
        c2 = _mul_const_shift(scalars, self.w2_limbs, _BARRETT_LIMBS, self.LM)
        k_mod = _truncate_mod(scalars, self.LM)

        t1 = _mul_const_low(c1, self.m_a1)
        t2 = _mul_const_low(c2, self.m_a2)
        s, _ = lb.add_carry(t1, t2)
        s = _mask_top(s)
        k1_raw, _ = lb.sub_borrow(k_mod, s)

        u1 = _mul_const_low(c1, self.m_b1)
        u2 = _mul_const_low(c2, self.m_b2)
        u, _ = lb.add_carry(u1, u2)
        u = _mask_top(u)
        zero = jnp.zeros_like(u)
        k2_raw, _ = lb.sub_borrow(zero, u)

        return _abs_sign(k1_raw) + _abs_sign(k2_raw)

    def endo(self, pts_aff):
        """phi(x, y) = (beta * x, y) on batched affine points."""
        x, y = pts_aff
        beta = jnp.broadcast_to(jnp.asarray(self.beta_mont), x.shape)
        return (self.ctx.fp.mul(x, beta), y)


# -- limb helpers (two's-complement over 16-bit digits) -----------------------


def _mul_const_full(a, w):
    """(N, La) canonical digits x host constant limbs (Lw,) -> full product
    as redundant columns (N, La+Lw+1), NOT normalized."""
    La = a.shape[-1]
    Lw = w.shape[0]
    t = jnp.zeros(a.shape[:-1] + (La + Lw + 1,), jnp.uint32)
    for j in range(Lw):
        wj = int(w[j])
        if wj == 0:
            continue
        prod = a * jnp.uint32(wj)               # exact: both < 2^16
        t = t.at[..., j:j + La].add(prod & MASK)
        t = t.at[..., j + 1:j + 1 + La].add(prod >> WORD_BITS)
    return t


def _mul_const_shift(a, w, shift_limbs: int, lout: int):
    """floor((a * w + 2^(16*shift_limbs - 1)) / 2^(16*shift_limbs)), lout limbs.

    The Barrett 'multiply by scaled reciprocal and take the top' step."""
    t = _mul_const_full(a, w)
    t = t.at[..., shift_limbs - 1].add(jnp.uint32(1 << (WORD_BITS - 1)))
    t = lb.normalize(t)
    out = t[..., shift_limbs:shift_limbs + lout]
    if out.shape[-1] < lout:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1)
                      + [(0, lout - out.shape[-1])])
    return out


def _mul_const_low(a, w):
    """(a * w) mod 2^(16*Lw), canonical digits (N, Lw). w: (Lw,) host limbs."""
    Lw = w.shape[0]
    t = _mul_const_full(a[..., :Lw], w)[..., :Lw + 1]
    t = lb.normalize(t)[..., :Lw]
    return _mask_top(t)


def _truncate_mod(a, L: int):
    """Value mod 2^(16*L) as (N, L) canonical digits."""
    if a.shape[-1] >= L:
        return a[..., :L]
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, L - a.shape[-1])])


def _mask_top(t):
    return t.at[..., -1].set(t[..., -1] & MASK)


def _abs_sign(raw):
    """Two's-complement (N, LM) -> (magnitude digits, neg mask)."""
    neg = ((raw[..., -1] >> (WORD_BITS - 1)) & 1).astype(jnp.bool_)
    negated, _ = lb.sub_borrow(jnp.zeros_like(raw), raw)
    return lb.cselect(neg, negated, raw), neg


# -- high-level wrappers ------------------------------------------------------


@functools.lru_cache(maxsize=None)
def get_glv(curve_name: str) -> GLV:
    from ..named.precompute import get_curve
    return GLV(get_curve(curve_name))


def msm_glv(ctx, points_aff, scalars, c: int = None, use_pallas: bool = None):
    """Endomorphism-accelerated MSM (applyEndomorphism analogue,
    ec_multi_scalar_mul.nim:398-434): N points with b-bit scalars become
    2N points with (b/2)-bit scalars; bucket count and the window-combine
    doubling chain halve."""
    from .msm import msm
    glv = get_glv(ctx.name)
    k1, n1, k2, n2 = glv.decompose(scalars)
    px, py = points_aff
    ex, ey = glv.endo((px, py))
    P1 = ctx.g1.aff_cneg(n1, (px, py))
    P2 = ctx.g1.aff_cneg(n2, (ex, ey))
    pts = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(P1, P2))
    ks = jnp.concatenate([k1, k2], axis=0)
    return msm(ctx.g1, pts, ks, c=c, scalar_bits=glv.mini_bits,
               use_pallas=use_pallas, glv=False)


def scalar_mul_glv(ctx, scalars, P_aff):
    """CT scalar mul via GLV split (scalarMulEndo analogue,
    ec_scalar_mul.nim:267): [k]P = [k1]P + [k2]phi(P) with half-length
    ladders, batched — the two half-ladders run as one doubled batch."""
    glv = get_glv(ctx.name)
    k1, n1, k2, n2 = glv.decompose(scalars)
    px, py = P_aff
    ex, ey = glv.endo((px, py))
    P1 = ctx.g1.aff_cneg(n1, (px, py))
    P2 = ctx.g1.aff_cneg(n2, (ex, ey))
    pts = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(P1, P2))
    ks = jnp.concatenate([k1, k2], axis=0)
    acc = ctx.g1.scalar_mul(ks, ctx.g1.from_affine(pts),
                            scalar_bits=glv.mini_bits)
    n = px.shape[0]
    half1 = tuple(t[:n] for t in acc)
    half2 = tuple(t[n:] for t in acc)
    return ctx.g1.add(half1, half2)


# ---------------------------------------------------------------------------
# GLS-4: 4-dimensional decomposition for BLS12 G2 (psi acts as [u])
# ---------------------------------------------------------------------------


def _det4(m):
    """4x4 integer determinant (cofactor expansion)."""
    def det3(a):
        return (a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
                - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
                + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0]))
    tot = 0
    for j in range(4):
        minor = [[m[i][k] for k in range(4) if k != j] for i in range(1, 4)]
        tot += (-1) ** j * m[0][j] * det3(minor)
    return tot


def _cofactor4(m, i, j):
    def det3(a):
        return (a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
                - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
                + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0]))
    minor = [[m[r][c] for c in range(4) if c != j]
             for r in range(4) if r != i]
    return (-1) ** (i + j) * det3(minor)


class GLS4:
    """4-dim GLS decomposition for BLS12 G2: k = k0 + k1 L + k2 L^2 + k3 L^3
    (mod r) with L = u (the curve parameter — psi(Q) = [u]Q on G2[r]).

    Re-design of the reference's m=4 decomposeEndo
    (constantine/math/endomorphisms/split_scalars.nim:95-125 with the
    babai constants of named/constants/bls12_381_endomorphisms.nim): the
    lattice basis is derived here from r(u) = u^4 - u^2 + 1 instead of
    hardcoded — rows (u,-1,0,0), (0,u,-1,0), (0,0,u,-1), (1,0,-1,u) all
    annihilate (1, L, L^2, L^3) mod r and have determinant +-r. Babai
    rounding runs on device as four Barrett products (same machinery as
    the 2-dim GLV above); mini-scalars come out as magnitude+sign lanes.
    """

    def __init__(self, ctx):
        params = ctx.params
        assert params.family == "bls12" and params.x_param, \
            f"{ctx.name}: GLS4 needs a BLS12 curve"
        u, r = params.x_param, ctx.r
        lam = u % r
        Bm = [[u, -1, 0, 0], [0, u, -1, 0], [0, 0, u, -1], [1, 0, -1, u]]
        for row in Bm:
            assert (row[0] + row[1] * lam + row[2] * lam**2
                    + row[3] * lam**3) % r == 0, "basis row not in lattice"
        det = _det4(Bm)
        assert abs(det) == r, (det, r)
        self.ctx = ctx
        self.lam = lam
        self.basis = Bm
        # c = (k,0,0,0) B^-1  =>  c_i = k * C[i][0] / det  (adjugate)
        w = [_cofactor4(Bm, i, 0) for i in range(4)]
        if det < 0:
            w = [-x for x in w]
        B = 1 << _BARRETT_BITS
        self.w_limbs, self.w_sign = [], []
        for wi in w:
            self.w_sign.append(-1 if wi < 0 else 1)
            scaled = (abs(wi) * B + r // 2) // r
            self.w_limbs.append(lb.int_to_limbs(
                scaled, lb.num_limbs(max(1, scaled.bit_length()))))

        maxv = max(abs(x) for row in Bm for x in row)
        self.mini_bits = maxv.bit_length() + 3
        self.LM = lb.num_limbs(self.mini_bits + WORD_BITS)
        Wm = 1 << (WORD_BITS * self.LM)
        # update constants: k_j = [j==0]*k - sum_i c_i * (s_i * B[i][j])
        self.m_consts = [[lb.int_to_limbs(
            (self.w_sign[i] * Bm[i][j]) % Wm, self.LM)
            for j in range(4)] for i in range(4)]
        self._validate()
        self.decompose = jax.jit(self.decompose)

    def _decompose_host(self, k: int):
        B = 1 << _BARRETT_BITS
        r = self.ctx.r
        cs = []
        for wl in self.w_limbs:
            wv = sum(int(v) << (WORD_BITS * i) for i, v in enumerate(wl))
            cs.append((k * wv + B // 2) >> _BARRETT_BITS)   # magnitudes
        ks = []
        for j in range(4):
            v = (k if j == 0 else 0)
            for i in range(4):
                v -= cs[i] * (self.w_sign[i] * self.basis[i][j])
            ks.append(v)
        return ks

    def _validate(self):
        import random
        rng = random.Random(0xA7C4)
        r, lam = self.ctx.r, self.lam
        for _ in range(64):
            k = rng.randrange(r)
            ks = self._decompose_host(k)
            acc = sum(ki * pow(lam, i, r) for i, ki in enumerate(ks))
            assert (acc - k) % r == 0, "GLS4 decomposition broken"
            assert max(abs(x) for x in ks) < (1 << self.mini_bits), \
                (k, ks, self.mini_bits)

    def decompose(self, scalars):
        """(N, Ls) canonical limbs -> [(k_i (N, LM), neg_i (N,)) x 4]."""
        cs = [_mul_const_shift(scalars, wl, _BARRETT_LIMBS, self.LM)
              for wl in self.w_limbs]
        k_mod = _truncate_mod(scalars, self.LM)
        outs = []
        for j in range(4):
            acc = jnp.zeros_like(k_mod) if j else k_mod
            s = None
            for i in range(4):
                t = _mul_const_low(cs[i], self.m_consts[i][j])
                s = t if s is None else _mask_top(lb.add_carry(s, t)[0])
            raw, _ = lb.sub_borrow(acc, s)
            outs.append(_abs_sign(_mask_top(raw)))
        return outs


@functools.lru_cache(maxsize=None)
def get_gls4(curve_name: str) -> GLS4:
    from ..named.precompute import get_curve
    return GLS4(get_curve(curve_name))


def _psi_affine(ctx, xy):
    """psi on affine G2 points: (conj(x) psi_x, conj(y) psi_y) — the
    untwist-Frobenius-twist map (models/hash_to_curve psi, affine form)."""
    from ..models.hash_to_curve import get_h2c
    from .towers import build_tower
    h2c = get_h2c()
    fp2 = build_tower(ctx.name)[0]
    x, y = xy
    px = jnp.broadcast_to(jnp.asarray(h2c.psi_x), x.shape)
    py = jnp.broadcast_to(jnp.asarray(h2c.psi_y), y.shape)
    return (fp2.mul(fp2.conj(x), px), fp2.mul(fp2.conj(y), py))


def scalar_mul_gls4_g2(ctx, scalars, Q_aff):
    """CT G2 scalar mul via 4-dim GLS (scalarMulEndo m=4 analogue,
    ec_scalar_mul.nim:267): [k]Q = sum_i [k_i] psi^i(Q) — four ~65-bit
    ladders run as ONE 4x batch, then a 2-level add tree. ~3.4x fewer
    ladder steps than the 255-bit ladder."""
    gls = get_gls4(ctx.name)
    parts = gls.decompose(scalars)
    g2 = ctx.g2
    pts, ks = [], []
    cur = Q_aff
    for i in range(4):
        ki, neg = parts[i]
        pts.append(g2.aff_cneg(neg, cur))
        ks.append(ki)
        if i < 3:
            cur = _psi_affine(ctx, cur)
    xs = jnp.concatenate([p[0] for p in pts], axis=0)
    ys = jnp.concatenate([p[1] for p in pts], axis=0)
    kk = jnp.concatenate(ks, axis=0)
    acc = g2.scalar_mul(kk, g2.from_affine((xs, ys)),
                        scalar_bits=gls.mini_bits)
    n = Q_aff[0].shape[0]
    h01 = g2.add(tuple(t[:n] for t in acc), tuple(t[n:2 * n] for t in acc))
    h23 = g2.add(tuple(t[2 * n:3 * n] for t in acc),
                 tuple(t[3 * n:] for t in acc))
    return g2.add(h01, h23)


def msm_gls4_g2(ctx, points_aff, scalars, c: int = None):
    """G2 MSM with the 4-dim pre-split (applyEndomorphism m=4 analogue):
    N points / 255-bit scalars -> 4N points / ~65-bit scalars."""
    from .msm import msm
    gls = get_gls4(ctx.name)
    parts = gls.decompose(scalars)
    g2 = ctx.g2
    pts, ks = [], []
    cur = points_aff
    for i in range(4):
        ki, neg = parts[i]
        pts.append(g2.aff_cneg(neg, cur))
        ks.append(ki)
        if i < 3:
            cur = _psi_affine(ctx, cur)
    xs = jnp.concatenate([p[0] for p in pts], axis=0)
    ys = jnp.concatenate([p[1] for p in pts], axis=0)
    kk = jnp.concatenate(ks, axis=0)
    return msm(g2, (xs, ys), kk, c=c, scalar_bits=gls.mini_bits, glv=False)
