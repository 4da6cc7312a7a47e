"""SHA-256: host oracle (hashlib) — the batched JAX witness-generation
variant lives in sha256_jax.py."""
import hashlib


def sha256(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()
