"""SHA-256: host oracle (hashlib) — the batched one-pass witness
generation lives in circuits/sha256_wide.py (numpy row-parallel)."""
import hashlib


def sha256(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()
