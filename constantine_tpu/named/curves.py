"""Named curve/field configuration registry.

The TPU-native analogue of the reference's `declareCurves:` DSL and constants
zoo (constantine/named/config_fields_and_curves.nim:45-289 and
constantine/named/constants/). Parameters are public mathematical constants;
derived values (Montgomery constants, Frobenius coefficients, GLV lattices,
roots of unity) are computed at registry-build time in precompute.py —
mirroring the reference's compile-time derivation
(constantine/named/deriv/precompute.nim:293-489) — and validated against the
host-side reference math in utils/refmath.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class CurveParams:
    name: str
    p: int                      # base field modulus
    r: int                      # subgroup order (scalar field modulus)
    a: int = 0                  # short-Weierstrass a
    b: int = 0                  # short-Weierstrass b
    gx: Optional[int] = None    # G1 generator
    gy: Optional[int] = None
    cofactor: int = 1
    family: str = ""            # 'bls12' | 'bn' | 'plain'
    x_param: Optional[int] = None   # BLS12 x / BN u (may be negative)
    # --- sextic-tower / pairing parameters (pairing-friendly curves only) ---
    fp2_nonresidue: Optional[int] = None          # u^2 = nr  (e.g. -1)
    fp6_nonresidue: Optional[Tuple[int, int]] = None  # xi in Fp2, v^3 = xi
    twist_kind: Optional[str] = None              # 'M' or 'D'
    g2_b: Optional[Tuple[Tuple[int, int], ...]] = None  # twist b coeff in Fp2
    g2_gx: Optional[Tuple[int, int]] = None       # G2 generator (Fp2 coords)
    g2_gy: Optional[Tuple[int, int]] = None
    g2_cofactor: int = 1
    fr_generator: Optional[int] = None  # canonical primitive root of Fr*
    #   (protocol-pinned: BLS12-381 uses 7 per the Ethereum KZG spec)


# -- BLS12-381 ---------------------------------------------------------------
# Parameters: see the reference's declareCurves entry
# (constantine/named/config_fields_and_curves.nim, BLS12_381) and the
# IETF pairing-friendly-curves draft. x = -0xd201000000010000.

_BLS12_381_P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
_BLS12_381_R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

BLS12_381 = CurveParams(
    name="BLS12_381",
    p=_BLS12_381_P,
    r=_BLS12_381_R,
    a=0,
    b=4,
    gx=0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
    gy=0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
    cofactor=0x396C8C005555E1568C00AAAB0000AAAB,
    family="bls12",
    x_param=-0xD201000000010000,
    fr_generator=7,
    fp2_nonresidue=-1,
    fp6_nonresidue=(1, 1),       # xi = 1 + u
    twist_kind="M",              # E'/Fp2 : y^2 = x^3 + 4*(1+u)
    g2_b=((4, 4),),
    g2_gx=(
        0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
        0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
    ),
    g2_gy=(
        0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
        0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
    ),
    g2_cofactor=0x5D543A95414E7F1091D50792876A202CD91DE4547085ABAA68A205B2E5A7DDFA628F1CB4D9E82EF21537E293A6691AE1616EC6E786F0C70CF1C38E31C7238E5,
)

# -- BN254-Snarks (alt_bn128, the Ethereum precompile curve) ------------------
# Reference: config_fields_and_curves.nim BN254_Snarks. u = 0x44E992B44A6909F1.

_BN254_P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
_BN254_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

BN254_Snarks = CurveParams(
    name="BN254_Snarks",
    p=_BN254_P,
    r=_BN254_R,
    a=0,
    b=3,
    gx=1,
    gy=2,
    cofactor=1,
    family="bn",
    x_param=0x44E992B44A6909F1,
    fr_generator=5,
    fp2_nonresidue=-1,
    fp6_nonresidue=(9, 1),       # xi = 9 + u
    twist_kind="D",              # E'/Fp2 : y^2 = x^3 + 3/(9+u)
    g2_gx=(
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    g2_gy=(
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)

# -- BLS12-377 (Zexe / EIP-2539) ----------------------------------------------
# Reference: config_fields_and_curves.nim:246-267. x = 0x8508C00000000001.
# Generators are not pinned by the reference config; precompute derives
# smallest-x points with cofactor clearing.

BLS12_377 = CurveParams(
    name="BLS12_377",
    p=0x01AE3A4617C510EAC63B05C06CA1493B1A22D9F300F5138F1EF3622FBA094800170B5D44300000008508C00000000001,
    r=0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001,
    a=0,
    b=1,
    family="bls12",
    x_param=0x8508C00000000001,
    fp2_nonresidue=-5,
    fp6_nonresidue=(0, 1),       # xi = u (u^2 = -5)
    twist_kind="D",              # E'/Fp2 : y^2 = x^3 + 1/u
)

# -- BN254-Nogami (Integer Variable chi-Based Ate Pairing, 2008) --------------
# Reference: config_fields_and_curves.nim:97-114. u = -(2^62 + 2^55 + 1).

BN254_Nogami = CurveParams(
    name="BN254_Nogami",
    p=0x2523648240000001BA344D80000000086121000000000013A700000000000013,
    r=0x2523648240000001BA344D8000000007FF9F800000000010A10000000000000D,
    a=0,
    b=2,
    cofactor=1,
    family="bn",
    x_param=-(2**62 + 2**55 + 1),
    fp2_nonresidue=-1,
    fp6_nonresidue=(1, 1),       # xi = 1 + u
    twist_kind="D",
)

# -- BW6-761 (embeds BLS12-377; one-layer Fp6 tower, G1 and G2 both /Fp) ------
# Reference: config_fields_and_curves.nim:289-311. Fields + EC group level;
# the degree-6 pairing (pairings_bw6_761.nim) is future work — G2 lives on
# the sextic twist over Fp itself (y^2 = x^3 + 4).

BW6_761 = CurveParams(
    name="BW6_761",
    p=0x122E824FB83CE0AD187C94004FAFF3EB926186A81D14688528275EF8087BE41707BA638E584E91903CEBAFF25B423048689C8ED12F9FD9071DCD3DC73EBFF2E98A116C25667A8F8160CF8AEEAF0A437E6913E6870000082F49D00000000008B,
    r=0x01AE3A4617C510EAC63B05C06CA1493B1A22D9F300F5138F1EF3622FBA094800170B5D44300000008508C00000000001,
    a=0,
    b=-1,
    # effective G1 cofactor (bw6_761_subgroups.nim:27): multiplying by it
    # lands in the r-subgroup, which is all generator derivation needs
    cofactor=0xAD1972339049CE762C77D5AC34CB12EFC856A0853C9DB94CC61C554757551C0C832BA4061000003B3DE580000000007C,
    family="plain",              # pairing: ops/pairing_bw6.py (k=6 tower
    x_param=0x8508C00000000001,  # built there; not the k=12 registry path)
)

# -- Pasta curves (Pallas / Vesta) --------------------------------------------
# Reference: config_fields_and_curves.nim Pallas/Vesta entries.

_PALLAS_P = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001
_VESTA_P = 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001

Pallas = CurveParams(
    name="Pallas", p=_PALLAS_P, r=_VESTA_P, a=0, b=5,
    gx=None, gy=None, family="plain",
)
Vesta = CurveParams(
    name="Vesta", p=_VESTA_P, r=_PALLAS_P, a=0, b=5,
    gx=None, gy=None, family="plain",
)

# -- secp256k1 ----------------------------------------------------------------

Secp256k1 = CurveParams(
    name="Secp256k1",
    p=2**256 - 2**32 - 977,
    r=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141,
    a=0,
    b=7,
    gx=0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
    gy=0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
    family="plain",
)

# -- NIST P-224 ----------------------------------------------------------------
# Reference: config_fields_and_curves.nim P224 entry (generic prime, a=-3).

P224 = CurveParams(
    name="P224",
    p=2**224 - 2**96 + 1,
    r=0xFFFFFFFFFFFFFFFFFFFFFFFFFFFF16A2E0B8F03E13DD29455C5C2A3D,
    a=-3,
    b=0xB4050A850C04B3ABF54132565044B0B7D7BFD8BA270B39432355FFB4,
    gx=0xB70E0CBD6BB4BF7F321390B94A03C1D356C21122343280D6115C1D21,
    gy=0xBD376388B5F723FB4C22DFE6CD4375A05A07476444D5819985007E34,
    family="plain",
)

# -- NIST P-256 ----------------------------------------------------------------

P256 = CurveParams(
    name="P256",
    p=0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF,
    r=0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551,
    a=-3,
    b=0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B,
    gx=0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
    gy=0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
    family="plain",
)

# -- Twisted Edwards curves ---------------------------------------------------
# Reference declareCurves entries with eq_form: TwistedEdwards
# (config_fields_and_curves.nim:148-196) and named/constants zoo generators.


@dataclass(frozen=True)
class EdwardsParams:
    """Twisted Edwards curve a*x^2 + y^2 = 1 + d*x^2*y^2."""
    name: str
    p: int
    r: int                      # prime subgroup order
    a: int                      # small int (-1, -5)
    d: int
    cofactor: int
    gx: Optional[int] = None    # prime-subgroup generator
    gy: Optional[int] = None


# Bandersnatch (eprint 2021/1152): embedded in the BLS12-381 scalar field.
# Banderwagon is the prime-order quotient scheme over the same curve
# (config_fields_and_curves.nim:161-196, banderwagon_generators.nim:20).
_BANDERSNATCH_D = 0x6389C12633C267CBC66E3BF86BE3B6D8CB66677177E54F92B369F2F5188D58E7
_BANDERSNATCH_R = 0x1CFB69D4CA675F520CCE760202687600FF8F87007419047174FD06B52876E7E1
_BANDERSNATCH_GX = 0x29C132CC2C0B34C5743711777BBE42F32B79C022AD998465E1E71866A252AE18
_BANDERSNATCH_GY = 0x2A6C669EDA123E0F157D8B50BADCD586358CAD81EEE464605E3167B6CC974166

Bandersnatch = EdwardsParams(
    name="Bandersnatch", p=_BLS12_381_R, r=_BANDERSNATCH_R,
    a=-5, d=_BANDERSNATCH_D, cofactor=4,
    gx=_BANDERSNATCH_GX, gy=_BANDERSNATCH_GY)

Banderwagon = EdwardsParams(
    name="Banderwagon", p=_BLS12_381_R, r=_BANDERSNATCH_R,
    a=-5, d=_BANDERSNATCH_D, cofactor=4,
    gx=_BANDERSNATCH_GX, gy=_BANDERSNATCH_GY)

# Jubjub (Zcash Sapling): embedded in the BLS12-381 scalar field
# (config_fields_and_curves.nim:148-159). Generator: the reference does not
# pin one; we use the standard find-low-y generator derived in precompute.
Jubjub = EdwardsParams(
    name="Jubjub", p=_BLS12_381_R,
    r=0xE7DB4EA6533AFA906673B0101343B00A6682093CCC81082D0970E5ED6F72CB7,
    a=-1,
    d=0x2A9318E74BFA2B48F5FD9207E6BD7FD4292D7F6D37579D2601065FD6D6343EB1,
    cofactor=8)

# BabyJubjub (EIP-2494): embedded in the BN254-Snarks scalar field
# (reference config_fields_and_curves.nim BabyJubjub entry). Twisted
# Edwards form 168700*x^2 + y^2 = 1 + 168696*x^2*y^2; generator below is
# the EIP-2494 prime-subgroup base point.
BabyJubjub = EdwardsParams(
    name="BabyJubjub", p=_BN254_R,
    r=2736030358979909402780800718157159386076813972158567259200215660948447373041,
    a=168700,
    d=168696,
    cofactor=8,
    gx=5299619240641551281634865583518297030282874472190772894086521144482721001553,
    gy=16950150798460657717958625567821834550301663161624707787222815936182638968203)

# Edwards25519 (RFC 7748/8032)
Edwards25519 = EdwardsParams(
    name="Edwards25519", p=(1 << 255) - 19,
    r=(1 << 252) + 27742317777372353535851937790883648493,
    a=-1,
    d=37095705934669439343138083508754565189542113879843219016388785533085940283555,
    cofactor=8,
    gx=15112221349535400772501151409588531511454012693041857206046113283949847762202,
    gy=46316835694926478169428394003475163141307993866256225615783033603165251855960)

EDWARDS_CURVES = {
    c.name: c for c in (Bandersnatch, Banderwagon, Jubjub, BabyJubjub,
                        Edwards25519)
}

# -- Small test fields (analogue of the reference's -d:CTT_TEST_CURVES fakes,
#    config_fields_and_curves.nim:48-75) --------------------------------------

TEST_FIELDS = {
    "F5": 5,
    "F101": 101,            # reference 'Fake101'
    "F103": 103,            # reference 'Fake103'
    "F10007": 10007,
    "F65519": 65519,
    "Mersenne61": (1 << 61) - 1,
    "Mersenne127": (1 << 127) - 1,
    "BabyBear": (1 << 31) - (1 << 27) + 1,
    "KoalaBear": (1 << 31) - (1 << 24) + 1,
    "Goldilocks": (1 << 64) - (1 << 32) + 1,
}

CURVES = {
    c.name: c for c in (BLS12_381, BLS12_377, BN254_Snarks, BN254_Nogami,
                        BW6_761, Pallas, Vesta, Secp256k1, P224, P256)
}
