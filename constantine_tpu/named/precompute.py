"""Registry-build-time constant derivation + validation.

TPU analogue of the reference's compile-time derivation pipeline
(constantine/named/deriv/precompute.nim:293-489,
constantine/named/deriv/derive_constants.nim:23): every derived constant
(cofactors, curve-family identities, NTT roots of unity, generators) is
computed here with python ints and cross-checked against the slow reference
math in utils/refmath.py. A broken constant raises at build time instead of
producing wrong field ops.

Build products are cached per curve in ``CurveCtx``.
"""

from __future__ import annotations

import functools

from ..utils import refmath as rm
from ..ops.field import Field
from . import curves as curvedefs


def is_prime(n: int, rounds: int = 24) -> bool:
    """Deterministic-enough Miller-Rabin for registry validation."""
    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    import random
    rng = random.Random(0xC0FFEE)
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


class CurveCtx:
    """A named curve with derived constants and Field contexts."""

    def __init__(self, params: curvedefs.CurveParams, validate: bool = True):
        self.params = params
        self.name = params.name
        self.p = params.p
        self.r = params.r
        self.a = params.a % params.p
        self.b = params.b % params.p
        # Crandall / pseudo-Mersenne fast path for moduli 2^m - c (e.g.
        # secp256k1 Fp, Edwards25519 Fp): analogue of the reference's
        # per-curve backend selection (named/properties_fields.nim:104-112).
        from ..ops.crandall import CrandallField, crandall_c
        self.fp = (CrandallField if crandall_c(self.p) else Field)(
            self.p, f"Fp[{self.name}]")
        self.fr = (CrandallField if crandall_c(self.r) else Field)(
            self.r, f"Fr[{self.name}]")

        # family identities / derived cofactors
        self.x_param = params.x_param
        self.h1 = params.cofactor
        self.h2 = params.g2_cofactor
        if params.family == "bls12":
            x = params.x_param
            assert self.r == x**4 - x**2 + 1, "BLS12 r(x) identity"
            assert self.p == ((x - 1) ** 2 * self.r) // 3 + x, "BLS12 p(x) identity"
            self.h1 = (x - 1) ** 2 // 3
            # E'(Fp2) cofactor, standard BLS12 closed form
            self.h2 = (x**8 - 4 * x**7 + 5 * x**6 - 4 * x**4 + 6 * x**3
                       - 4 * x**2 - 4 * x + 13) // 9
            self.trace = x + 1  # t(x) = x + 1
        elif params.family == "bn":
            u = params.x_param
            t = 6 * u * u + 1
            assert self.p == 36 * u**4 + 36 * u**3 + 24 * u**2 + 6 * u + 1
            assert self.r == 36 * u**4 + 36 * u**3 + 18 * u**2 + 6 * u + 1
            assert self.r == self.p + 1 - t
            self.h1 = 1
            self.h2 = self.p + t - 1  # #E'(Fp2) = r * (p + t - 1) for BN
            self.trace = t

        # generator: pinned, or derived deterministically (smallest x with a
        # curve point, even-ish y, cofactor-cleared into the r-subgroup —
        # the reference pins all generators in named/constants/*_generators;
        # derivation is our fallback for curves whose zoo has none)
        if params.gx is None:
            x = 0
            while True:
                x += 1
                rhs = (x * x * x + self.a * x + self.b) % self.p
                y = rm.sqrt_mod(rhs, self.p)
                if y is None:
                    continue
                y = min(y, self.p - y)
                g = rm.ec_mul(self.h1, (x, y), self.a, self.p) \
                    if self.h1 != 1 else (x, y)
                if g is not None:
                    self.g = g
                    break
        else:
            self.g = (params.gx, params.gy)

        # G2 generator over the twist (derived when not pinned)
        if params.g2_gx is not None:
            self.g2_aff = (params.g2_gx, params.g2_gy)
        elif params.fp2_nonresidue is not None and self.h2 != 1:
            p, nr = self.p, params.fp2_nonresidue
            bp = self.g2_b()
            k = 0
            while True:
                k += 1
                x2 = (k, 1)
                x3 = rm.fp2_mul(x2, rm.fp2_mul(x2, x2, nr, p), nr, p)
                y2 = self._fp2_sqrt(rm.fp2_add(x3, bp, p))
                if y2 is None:
                    continue
                g2 = rm.ec2_mul(self.h2, (x2, y2), (0, 0), nr, p)
                if g2 is not None:
                    self.g2_aff = g2
                    break
        else:
            self.g2_aff = None

        if validate:
            self._validate()

    # -- validation (host reference math) ----------------------------------

    def _validate(self):
        p, r, a, b = self.p, self.r, self.a, self.b
        assert is_prime(p), f"{self.name}: p not prime"
        assert is_prime(r), f"{self.name}: r not prime"
        assert rm.ec_is_on_curve(self.g, a, b, p), f"{self.name}: bad generator"
        assert rm.ec_mul(r, self.g, a, p) is None, f"{self.name}: generator order"
        if self.g2_aff is not None:
            nr = self.params.fp2_nonresidue
            g2 = self.g2_aff
            bp = self.g2_b()
            # on-curve check over Fp2
            lhs = rm.fp2_mul(g2[1], g2[1], nr, p)
            rhs = rm.fp2_add(
                rm.fp2_mul(g2[0], rm.fp2_mul(g2[0], g2[0], nr, p), nr, p), bp, p)
            assert lhs == rhs, f"{self.name}: G2 generator not on twist"
            assert rm.ec2_mul(r, g2, (0, 0), nr, p) is None, \
                f"{self.name}: G2 generator order"
            if self.h2:
                # cofactor formula sanity: h2 * r must annihilate the twist
                q = rm.ec2_mul(self.h2 % r or self.h2, g2, (0, 0), nr, p)
                # (generator already has order r so this is trivially true;
                # the real check is on a random twist point)
                pt = self._random_twist_point()
                assert rm.ec2_mul(self.h2 * r, pt, (0, 0), nr, p) is None, \
                    f"{self.name}: G2 cofactor formula wrong"

    def _random_twist_point(self):
        """Deterministic non-subgroup point on E'(Fp2) for validation."""
        import random
        rng = random.Random(42)
        p, nr = self.p, self.params.fp2_nonresidue
        bp = self.g2_b()
        while True:
            x = (rng.randrange(p), rng.randrange(p))
            x3 = rm.fp2_mul(x, rm.fp2_mul(x, x, nr, p), nr, p)
            rhs = rm.fp2_add(x3, bp, p)
            # sqrt in Fp2 via norm trick: rhs = c0 + c1 u; find y s.t. y^2 = rhs
            y = self._fp2_sqrt(rhs)
            if y is not None:
                return (x, y)

    def _fp2_sqrt(self, v):
        """Host-side sqrt in Fp2 (u^2 = nr), or None."""
        p, nr = self.p, self.params.fp2_nonresidue
        c0, c1 = v
        if c1 == 0:
            y0 = rm.sqrt_mod(c0, p)
            if y0 is not None:
                return (y0, 0)
            y1 = rm.sqrt_mod(c0 * rm.inv_mod(nr % p, p) % p, p)
            return None if y1 is None else (0, y1)
        # norm = c0^2 - nr c1^2 must be a QR; y0^2 = (c0 ± sqrt(norm))/2
        norm = (c0 * c0 - nr * c1 * c1) % p
        sn = rm.sqrt_mod(norm, p)
        if sn is None:
            return None
        inv2 = rm.inv_mod(2, p)
        for s in (sn, p - sn):
            t = (c0 + s) * inv2 % p
            y0 = rm.sqrt_mod(t, p)
            if y0 is not None and y0 != 0:
                y1 = c1 * rm.inv_mod(2 * y0, p) % p
                if rm.fp2_mul((y0, y1), (y0, y1), nr, p) == (c0 % p, c1 % p):
                    return (y0, y1)
        return None

    # -- derived helpers -----------------------------------------------------

    def g2_b(self):
        """Twist curve b' in Fp2: M-twist b*xi, D-twist b/xi."""
        p, nr = self.p, self.params.fp2_nonresidue
        xi = self.params.fp6_nonresidue
        if self.params.twist_kind == "M":
            return rm.fp2_mul((self.b, 0), xi, nr, p)
        return rm.fp2_mul((self.b, 0), rm.fp2_inv(xi, nr, p), nr, p)

    @functools.cached_property
    def g1(self):
        """Batched G1 group ops (ops.ec.ECGroup over Fp)."""
        from ..ops.ec import ECGroup
        b_elem = self.fp.encode([self.b])[0]
        return ECGroup(self.fp, self.params.a, b_elem, name=f"{self.name}.G1")

    @functools.cached_property
    def g1_gen(self):
        """G1 generator as device affine (x, y), batch shape (1,)."""
        return (self.fp.encode([self.g[0]]), self.fp.encode([self.g[1]]))

    @functools.cached_property
    def g2(self):
        """Batched G2 group ops (ECGroup over Fp2 on the twist)."""
        from ..ops.ec import ECGroup
        from ..ops.towers import build_tower
        fp2, _, _ = build_tower(self.name)
        bp = self.g2_b()
        b_elem = fp2.encode([bp[0], bp[1]])
        return ECGroup(fp2, 0, b_elem, name=f"{self.name}.G2")

    @functools.cached_property
    def g2_gen(self):
        from ..ops.towers import build_tower
        fp2, _, _ = build_tower(self.name)
        (gx2, gy2) = self.g2_aff
        gx = fp2.encode([gx2[0], gx2[1]])[None]
        gy = fp2.encode([gy2[0], gy2[1]])[None]
        return (gx, gy)

    def scalars_to_limbs(self, ks):
        """Python ints -> canonical (N, L_r) scalar limb array (mod r)."""
        from ..ops import limbs as lb
        return lb.ints_to_limbs([k % self.r for k in ks], self.fr.L)

    @functools.cached_property
    def two_adicity(self) -> int:
        n = self.r - 1
        s = 0
        while n % 2 == 0:
            n //= 2
            s += 1
        return s

    def root_of_unity(self, log_size: int) -> int:
        """Primitive 2^log_size-th root of unity in Fr: g^((r-1)/2^k) with g
        the curve's pinned primitive root (Ethereum spec:
        PRIMITIVE_ROOT_OF_UNITY = 7 for BLS12-381)."""
        assert log_size <= self.two_adicity, \
            f"{self.name}: Fr 2-adicity {self.two_adicity} < {log_size}"
        g = self._field_generator
        return pow(g, (self.r - 1) >> log_size, self.r)

    @functools.cached_property
    def _field_generator(self) -> int:
        """Protocol-pinned primitive root of Fr* when the curve params define
        one (BLS12-381: 7 per the Ethereum KZG spec — the exact root matters:
        a different QNR gives a domain agreeing on even powers only);
        otherwise the smallest QNR (full 2-Sylow order)."""
        g = self.params.fr_generator
        if g is not None:
            assert pow(g, (self.r - 1) // 2, self.r) == self.r - 1
            return g
        for g in range(2, 1000):
            if pow(g, (self.r - 1) // 2, self.r) == self.r - 1:
                return g
        raise RuntimeError("no generator found")


class EdwardsCtx:
    """A named twisted Edwards curve with derived constants and groups.

    Analogue of CurveCtx for the reference's eq_form: TwistedEdwards curves
    (Bandersnatch/Banderwagon/Jubjub/Edwards25519)."""

    def __init__(self, params: curvedefs.EdwardsParams, validate: bool = True):
        self.params = params
        self.name = params.name
        self.p = params.p
        self.r = params.r
        self.a = params.a
        self.d = params.d % params.p
        # Crandall / pseudo-Mersenne fast path for moduli 2^m - c (e.g.
        # secp256k1 Fp, Edwards25519 Fp): analogue of the reference's
        # per-curve backend selection (named/properties_fields.nim:104-112).
        from ..ops.crandall import CrandallField, crandall_c
        self.fp = (CrandallField if crandall_c(self.p) else Field)(
            self.p, f"Fp[{self.name}]")
        self.fr = (CrandallField if crandall_c(self.r) else Field)(
            self.r, f"Fr[{self.name}]")
        self.cofactor = params.cofactor

        if params.gx is None:
            # derive: smallest y with a valid x, cleared of cofactor
            y = 2
            while True:
                y += 1
                num = (1 - y * y) % self.p
                den = (self.a - self.d * y * y) % self.p
                x = rm.sqrt_mod(num * rm.inv_mod(den, self.p) % self.p, self.p)
                if x is None:
                    continue
                cand = rm.ed_mul(params.cofactor, (x, y), self.a, self.d, self.p)
                if cand != (0, 1):
                    self.g = cand
                    break
        else:
            self.g = (params.gx, params.gy)

        if validate:
            assert is_prime(self.p) and is_prime(self.r), self.name
            assert rm.ed_is_on_curve(self.g, self.a, self.d, self.p), \
                f"{self.name}: generator off-curve"
            assert rm.ed_mul(self.r, self.g, self.a, self.d, self.p) == (0, 1), \
                f"{self.name}: generator order"
            # d must be non-square for the complete addition law
            assert pow(self.d, (self.p - 1) // 2, self.p) == self.p - 1, \
                f"{self.name}: d is a square — addition not complete"

    @functools.cached_property
    def group(self):
        from ..ops.ec_edwards import ECTwEdwards
        d_elem = self.fp.encode([self.d])[0]
        return ECTwEdwards(self.fp, self.params.a, d_elem, name=self.name)

    @functools.cached_property
    def gen(self):
        """Generator as device affine (x, y), batch shape (1,)."""
        return (self.fp.encode([self.g[0]]), self.fp.encode([self.g[1]]))

    def scalars_to_limbs(self, ks):
        from ..ops import limbs as lb
        return lb.ints_to_limbs([k % self.r for k in ks], self.fr.L)


@functools.lru_cache(maxsize=None)
def get_curve(name: str) -> CurveCtx:
    return CurveCtx(curvedefs.CURVES[name])


@functools.lru_cache(maxsize=None)
def get_edwards(name: str) -> EdwardsCtx:
    return EdwardsCtx(curvedefs.EDWARDS_CURVES[name])


@functools.lru_cache(maxsize=None)
def get_field(name: str) -> Field:
    """Field registry: curve fields as '<Curve>.Fp'/'<Curve>.Fr', or test
    fields by name ('F101', 'BabyBear', ...)."""
    if name in curvedefs.TEST_FIELDS:
        from ..ops.crandall import CrandallField, crandall_c
        p = curvedefs.TEST_FIELDS[name]
        return (CrandallField if crandall_c(p) else Field)(p, name)
    curve, which = name.rsplit(".", 1)
    ctx = get_curve(curve)
    return ctx.fp if which == "Fp" else ctx.fr
