"""ctypes bindings to the host-native C++ runtime (native/).

The native library covers the byte-oriented host path: hashing for
Fiat-Shamir transcripts / hash-to-curve / codecs, and bulk conversion
between big-endian byte strings and planar 16-bit-limb arrays (the
reference's hashes/*.nim and serialization/io_limbs.nim, via a C ABI like
the reference's bindings layer, include/constantine.h).

Falls back to pure-python implementations (utils/hashes.py, ops/limbs.py)
when the shared library has not been built — `make -C native` builds it;
`build()` below shells that out on demand.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_ROOT, "native", "libconstantine_tpu_host.so")

_lib = None


def build(quiet: bool = True) -> bool:
    """Compile the native library in-tree. Returns True on success."""
    try:
        subprocess.run(["make", "-C", os.path.join(_ROOT, "native")],
                       check=True,
                       capture_output=quiet)
        return True
    except Exception:
        return False


def load():
    """Load (building if necessary). Returns the ctypes lib or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        if os.environ.get("CTT_NO_NATIVE") == "1" or not build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    if lib.ctt_abi_version() != 1:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.ctt_sha256.argtypes = [ctypes.c_char_p, ctypes.c_size_t, u8p]
    lib.ctt_keccak256.argtypes = [ctypes.c_char_p, ctypes.c_size_t, u8p]
    lib.ctt_sha3_256.argtypes = [ctypes.c_char_p, ctypes.c_size_t, u8p]
    lib.ctt_ripemd160.argtypes = [ctypes.c_char_p, ctypes.c_size_t, u8p]
    lib.ctt_hmac_sha256.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                    ctypes.c_char_p, ctypes.c_size_t, u8p]
    lib.ctt_bytes_be_to_limbs.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t, u32p,
        ctypes.c_size_t]
    lib.ctt_limbs_to_bytes_be.argtypes = [
        u32p, ctypes.c_size_t, ctypes.c_size_t, u8p, ctypes.c_size_t]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _digest(fn, data: bytes, outlen: int) -> bytes:
    out = (ctypes.c_uint8 * outlen)()
    fn(data, len(data), out)
    return bytes(out)


def sha256(data: bytes) -> bytes:
    return _digest(load().ctt_sha256, data, 32)


def keccak256(data: bytes) -> bytes:
    return _digest(load().ctt_keccak256, data, 32)


def sha3_256(data: bytes) -> bytes:
    return _digest(load().ctt_sha3_256, data, 32)


def ripemd160(data: bytes) -> bytes:
    return _digest(load().ctt_ripemd160, data, 20)


def hmac_sha256(key: bytes, msg: bytes) -> bytes:
    out = (ctypes.c_uint8 * 32)()
    load().ctt_hmac_sha256(key, len(key), msg, len(msg), out)
    return bytes(out)


def bytes_be_to_limbs(data: bytes, nbytes: int, L: int):
    import numpy as np
    n = len(data) // nbytes
    out = np.zeros((n, L), dtype=np.uint32)
    rc = load().ctt_bytes_be_to_limbs(
        data, nbytes, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), L)
    if rc != 0:
        raise ValueError("bad widths")
    return out


def limbs_to_bytes_be(limbs, nbytes: int) -> bytes:
    import numpy as np
    a = np.ascontiguousarray(limbs, dtype=np.uint32)
    if a.ndim == 1:
        a = a[None]
    n, L = a.shape
    out = (ctypes.c_uint8 * (n * nbytes))()
    rc = load().ctt_limbs_to_bytes_be(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), L, n,
        ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)), nbytes)
    if rc != 0:
        raise ValueError("bad widths")
    return bytes(out)
