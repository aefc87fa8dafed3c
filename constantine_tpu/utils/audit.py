"""Side-channel discipline tooling — the TPU analogue of the reference's
static vartime-effect audit.

The reference enforces constant-time discipline with Nim effect tracking:
variable-time routines carry `{.tags:[VarTime].}` and secret data flowing
into them is a COMPILE error (ARCHITECTURE.md:96-122). This module is the
same idea re-expressed for JAX:

* `assert_constant_time(fn, *example_args)` — proves, by construction,
  that `fn`'s control flow and op schedule are independent of its input
  VALUES: it traces `fn` with abstract (shape/dtype-only) tracers via
  `jax.make_jaxpr`. Any data-dependent host branch (`if x > 0`,
  `int(x)`, `.item()`, value-dependent shapes) raises a
  ConcretizationTypeError and FAILS the audit. A function that traces is
  a fixed straight-line program: on an SPMD backend every lane executes
  the identical op sequence regardless of secret values — the lane-wise
  `select` is the reference's `ccopy`. This is strictly stronger than
  the reference's audit (which trusts the tag annotations): here the
  *compiler* exhibits the input-independent schedule.

* `@vartime` — registry marking functions that intentionally branch on
  input values on the host. These may only ever receive PUBLIC data
  (serialized points/signatures being validated, protocol parameters,
  lengths). `vartime_registry()` enumerates them so tests can assert the
  vartime surface stays explicit and reviewed, mirroring the
  `_vartime` name suffix convention of the reference
  (ec_scalar_mul_vartime.nim etc.).

Caveat (documented, matching the reference's threat model): value-
independence of the TRACE does not prove the hardware executes each
vector op in data-independent time; like the reference (which assumes
constant-time multipliers), we assume the VPU's integer ops are
data-oblivious — there is no data-dependent early-out in the XLA:TPU
ISA's fixed-width integer lanes.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax

_VARTIME: Dict[str, Callable] = {}


def vartime(fn: Callable = None, *, reason: str = ""):
    """Mark `fn` as variable-time (host branching on input values).

    Vartime functions must only receive public inputs. The decorator is
    metadata-only (no behavioral change) — it exists so the vartime
    surface is enumerable and auditable, like the reference's
    `{.tags:[VarTime].}` effect annotations."""
    def wrap(f):
        key = f"{f.__module__}.{f.__qualname__}"
        _VARTIME[key] = f
        f.__vartime__ = True
        f.__vartime_reason__ = reason
        return f
    if fn is not None:
        return wrap(fn)
    return wrap


def vartime_registry() -> Dict[str, Callable]:
    return dict(_VARTIME)


def is_vartime(fn: Callable) -> bool:
    return bool(getattr(fn, "__vartime__", False))


def assert_constant_time(fn: Callable, *example_args, **example_kwargs):
    """Prove `fn` has a value-independent op schedule.

    Traces `fn` with abstract tracers shaped like `example_args`. Success
    means NO host branch anywhere in `fn` (or anything it calls) depends
    on input values — the compiled program is one fixed op sequence.
    Returns the jaxpr (useful for op-count metering / inspection).

    Raises `ConstantTimeViolation` if tracing hits a concretization
    (value-dependent branch), chaining the offending frame.
    """
    try:
        return jax.make_jaxpr(fn)(*example_args, **example_kwargs)
    except (jax.errors.ConcretizationTypeError,
            jax.errors.TracerBoolConversionError,
            jax.errors.TracerArrayConversionError,
            jax.errors.TracerIntegerConversionError) as e:
        raise ConstantTimeViolation(
            f"{getattr(fn, '__qualname__', fn)} branches on input values "
            f"(see chained trace): {e}") from e


class ConstantTimeViolation(AssertionError):
    """A supposedly constant-time path branches on secret-typed input."""
