"""Calldata encoding for generated EVM verifiers.

Mirrors snark-verifier's encode_calldata (consumed by the reference at
util/circuit.rs:255-271 / rpc.rs:160): instance scalars as 32-byte BE
words, column-major, followed by the raw proof bytes.
"""
from __future__ import annotations

from typing import List

from ..fields.params import BN254_FR as FR


def encode_calldata(instances: List[List[int]], proof_data: bytes) -> bytes:
    out = bytearray()
    for col in instances:
        for v in col:
            out += int(v % FR).to_bytes(32, "big")
    out += proof_data
    return bytes(out)
