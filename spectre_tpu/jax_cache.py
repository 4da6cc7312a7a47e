"""Persistent XLA compilation cache, shared by every entry point.

Most cold-start wall-clock in this stack is XLA compiling the same prover
programs again: a fresh process proving the toy circuit compiles ~100
programs (minutes on a 4-core host; 20-40 s per program through the TPU
tunnel's remote compiler). The on-disk cache (build/jax_cache) makes any
program compiled once by any process load in milliseconds.

Call enable() BEFORE the first jit execution (import time is fine; the
config flags apply to subsequent compiles). Entries are written atomically,
so concurrent writers (pytest-xdist workers, hostpool worker processes)
are safe.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "build", "jax_cache")


def enable(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at `cache_dir`
    (default: <repo>/build/jax_cache). Returns the dir, or None if JAX
    isn't importable / the flags don't exist (older jaxlib)."""
    cache_dir = cache_dir or os.environ.get("SPECTRE_JAX_CACHE", _DEFAULT)
    # every cache load E-logs a spurious "+prefer-no-scatter not supported"
    # machine-feature diff (XLA pseudo-features absent from the host list);
    # silence C++ logs — real failures still surface as Python exceptions
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return cache_dir
    except Exception:   # noqa: BLE001 — cache is an optimization only
        return None
