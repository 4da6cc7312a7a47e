"""Native (C) helper loader.

The reference's transcript hashing and witness-gen inner loops are native
(tiny-keccak / sha2 via snark-verifier and zkevm-hashes); here the C
sources live in native/ and are compiled once per machine into
build/native/ with the system compiler, loaded through ctypes. Every entry
point has a pure-Python fallback, so the package works without a
toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native")
_OUT = os.path.join(_REPO, "build", "native")

_libs: dict = {}


def _build(name: str, sources) -> str | None:
    so = os.path.join(_OUT, f"lib{name}.so")
    srcs = [os.path.join(_SRC, s) for s in sources]
    if not all(os.path.exists(s) for s in srcs):
        return None
    if os.path.exists(so) and all(
            os.path.getmtime(so) >= os.path.getmtime(s) for s in srcs):
        return so
    os.makedirs(_OUT, exist_ok=True)
    cmd = ["cc", "-O3", "-shared", "-fPIC", "-o", so, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return so


def load(name: str, sources) -> ctypes.CDLL | None:
    """Build (if stale) and dlopen a native helper; None on any failure."""
    if name in _libs:
        return _libs[name]
    so = _build(name, sources)
    lib = None
    if so is not None:
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            lib = None
    _libs[name] = lib
    return lib


def keccak_lib() -> ctypes.CDLL | None:
    lib = load("spectre_keccak", ["keccak.c"])
    if lib is not None and not getattr(lib, "_sigset", False):
        lib.spectre_keccak256.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
        lib.spectre_keccak256.restype = None
        lib._sigset = True
    return lib
