"""Low-level public API façade — stable import surface for power users.

Parity with the reference's lowlevel export modules
(constantine/lowlevel_bigints.nim, lowlevel_fields.nim,
lowlevel_extension_fields.nim, lowlevel_elliptic_curves.nim,
lowlevel_pairing_curves.nim): the reference re-exports its internal
bigint/field/EC/pairing primitives under a supported namespace with the
caveat that the API is "not stable across versions" — same deal here.

Usage:

    from constantine_tpu import lowlevel as ll
    F = ll.get_field("BLS12_381.Fp")
    ctx = ll.get_curve("BLS12_381")
    r = ll.msm(ctx.g1, points, scalars)

Everything here is a re-export; the implementation lives in ops/ and
named/. Protocol-level APIs (EIP-4844, BLS signatures, ...) live in
models/ and are the stable surface.
"""

from __future__ import annotations

# -- bigint/limb primitives (lowlevel_bigints.nim analogue) -------------------
from .ops.limbs import (                                    # noqa: F401
    num_limbs, int_to_limbs, ints_to_limbs, limbs_to_int, limbs_to_ints,
    bytes_be_to_limbs, limbs_to_bytes_be,
    add_carry, sub_borrow, cselect, geq, is_zero, eq,
    shift_right_bits, get_bit,
)

# -- finite fields (lowlevel_fields.nim analogue) ------------------------------
from .ops.field import Field                                # noqa: F401
from .ops.crandall import CrandallField, crandall_c         # noqa: F401
from .ops.sqrt import (                                     # noqa: F401
    SqrtCtx, get_sqrt_fp, get_sqrt_fr, get_sqrt_fp2,
)

# -- extension towers (lowlevel_extension_fields.nim analogue) -----------------
from .ops.towers import build_tower                         # noqa: F401

# -- elliptic curves (lowlevel_elliptic_curves.nim analogue) -------------------
from .ops.ec import ECGroup                                 # noqa: F401
from .ops.ec_edwards import ECTwEdwards                     # noqa: F401
from .ops.scalar_mul import (                               # noqa: F401
    scalar_mul_windowed, scalar_mul_vartime, scalar_mul_dispatch,
)
from .ops.glv import GLV, get_glv, msm_glv, scalar_mul_glv  # noqa: F401
from .ops.msm import msm, msm_jit, best_window_size         # noqa: F401
from .ops.subgroups import (                                # noqa: F401
    is_in_subgroup_g1, is_in_subgroup_g2,
)
from .ops import bigint_ap                                  # noqa: F401
from .ops.sha256_jax import (                               # noqa: F401
    sha256_batch, expand_message_xmd_batch,
)
from .ops.msm_precomp import PrecomputedMSM                 # noqa: F401
from .ops.ntt import get_domain, bit_reversal_perm          # noqa: F401
from .ops.poly import PolyOps                                # noqa: F401
from .ops.ec_fft import ECFFTDomain                         # noqa: F401

# -- pairings (lowlevel_pairing_curves.nim analogue) ---------------------------
from .ops.pairing import get_pairing, MillerAccumulator     # noqa: F401
from .ops.gt import get_gt                                  # noqa: F401

# -- curve/field registry (named/ DSL analogue) --------------------------------
from .named.precompute import (                             # noqa: F401
    get_curve, get_edwards, get_field, CurveCtx, EdwardsCtx,
)
