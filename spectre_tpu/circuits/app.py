"""AppCircuit lifecycle — the util/circuit.rs:86-239 analog.

A circuit class declares how to build itself from a witness; the lifecycle
provides keygen with on-disk PK caching + pinning JSON (the reproducibility
mechanism mirroring Eth2ConfigPinning: if the pk file exists it is reused
and the pinning is NOT rewritten), proof generation, and verification.
"""
from __future__ import annotations

import json
import os
import pickle
from dataclasses import dataclass
from typing import Optional

from ..poly import kzg
from ..plonk.keygen import keygen, ProvingKey
from ..plonk.prover import create_proof, Proof
from ..plonk.verifier import verify_proof
from .builder import CircuitBuilder


@dataclass
class Pinning:
    """Circuit-shape pinning (Eth2ConfigPinning analog)."""
    k: int
    lookup_bits: Optional[int] = None
    n_advice: Optional[int] = None     # recorded break-point shape
    meta: dict = None

    def write(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"k": self.k, "lookup_bits": self.lookup_bits,
                       "n_advice": self.n_advice, "meta": self.meta or {}},
                      f, indent=2)

    @classmethod
    def from_path(cls, path: str) -> "Pinning":
        with open(path) as f:
            d = json.load(f)
        return cls(k=d["k"], lookup_bits=d.get("lookup_bits"),
                   n_advice=d.get("n_advice"), meta=d.get("meta") or {})


class AppCircuit:
    """Subclasses implement build(witness, spec) -> CircuitBuilder."""

    @classmethod
    def build(cls, witness, spec) -> CircuitBuilder:
        raise NotImplementedError

    @classmethod
    def default_witness(cls, spec):
        raise NotImplementedError

    # ---- lifecycle ----
    @classmethod
    def create_pk(cls, spec, k: int, srs: kzg.SrsKZG,
                  pk_path: Optional[str] = None,
                  pinning_path: Optional[str] = None,
                  witness=None) -> ProvingKey:
        """Keygen with PK caching: an existing pk file is reused and the
        pinning left untouched (util/circuit.rs:119-137)."""
        if pk_path and os.path.exists(pk_path):
            with open(pk_path, "rb") as f:
                return pickle.load(f)
        witness = witness if witness is not None else cls.default_witness(spec)
        builder = cls.build(witness, spec)
        cs, fixed, _, _ = builder.compile(k)
        pk = keygen(cs, k, fixed, srs)
        if pk_path:
            os.makedirs(os.path.dirname(pk_path) or ".", exist_ok=True)
            with open(pk_path, "wb") as f:
                pickle.dump(pk, f)
        if pinning_path:
            Pinning(k=k, lookup_bits=builder.lookup_bits,
                    n_advice=len([c for c in cs.advice]),
                    meta={"circuit": cls.__name__,
                          "spec": getattr(spec, "name", "")},
                    ).write(pinning_path)
        return pk

    @classmethod
    def gen_proof(cls, pk: ProvingKey, spec, srs: kzg.SrsKZG,
                  witness) -> tuple:
        """Returns (proof, instances)."""
        builder = cls.build(witness, spec)
        cs, fixed, advice, instances = builder.compile(pk.vk.k)
        proof = create_proof(pk, srs, advice, instances)
        return proof, instances

    @classmethod
    def verify(cls, pk: ProvingKey, srs: kzg.SrsKZG, proof: Proof,
               instances) -> bool:
        return verify_proof(pk.vk, srs, proof, instances)
