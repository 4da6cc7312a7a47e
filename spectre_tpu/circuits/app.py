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
    """Circuit-shape pinning (Eth2ConfigPinning / Halo2ConfigPinning
    analog, util/circuit.rs:26-78): keygen writes the FULL layout —
    column counts, per-column break points, lookup config and a structural
    hash — and prover-mode compile verifies against it, erroring loudly on
    drift (the file-driven reproducibility contract)."""
    k: int
    lookup_bits: Optional[int] = None
    n_advice: Optional[int] = None
    n_fixed: Optional[int] = None
    n_lookups: Optional[int] = None
    break_points: Optional[list] = None    # vertical-gate column heights
    layout_hash: Optional[str] = None
    meta: dict = None

    def write(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"k": self.k, "lookup_bits": self.lookup_bits,
                       "n_advice": self.n_advice, "n_fixed": self.n_fixed,
                       "n_lookups": self.n_lookups,
                       "break_points": self.break_points,
                       "layout_hash": self.layout_hash,
                       "meta": self.meta or {}},
                      f, indent=2)

    @classmethod
    def from_path(cls, path: str) -> "Pinning":
        with open(path) as f:
            d = json.load(f)
        return cls(k=d["k"], lookup_bits=d.get("lookup_bits"),
                   n_advice=d.get("n_advice"), n_fixed=d.get("n_fixed"),
                   n_lookups=d.get("n_lookups"),
                   break_points=d.get("break_points"),
                   layout_hash=d.get("layout_hash"),
                   meta=d.get("meta") or {})

    @classmethod
    def from_layout(cls, layout: dict, meta: dict = None) -> "Pinning":
        return cls(k=layout["k"], lookup_bits=layout["lookup_bits"],
                   n_advice=layout["n_advice"], n_fixed=layout["n_fixed"],
                   n_lookups=layout["n_lookups"],
                   break_points=layout["break_points"],
                   layout_hash=layout["layout_hash"], meta=meta or {})


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
        pinning left untouched (util/circuit.rs:119-137) — unless the
        pinning file is missing entirely, in which case the layout is
        compiled and frozen so pre-pinning PK caches gain their pinning
        on next use (VERDICT r4 next #8)."""
        if pk_path and os.path.exists(pk_path):
            with open(pk_path, "rb") as f:
                pk = pickle.load(f)
            if pinning_path and not os.path.exists(pinning_path):
                witness = (witness if witness is not None
                           else cls.default_witness(spec))
                builder = cls.build(witness, spec)
                builder.compile(k)
                Pinning.from_layout(
                    builder.last_layout,
                    meta={"circuit": cls.__name__,
                          "spec": getattr(spec, "name", "")},
                ).write(pinning_path)
            return pk
        witness = witness if witness is not None else cls.default_witness(spec)
        builder = cls.build(witness, spec)
        cs, fixed, _, _ = builder.compile(k)
        pk = keygen(cs, k, fixed, srs,
                    checkpoint=pk_path + ".ckpt" if pk_path else None)
        if pk_path:
            os.makedirs(os.path.dirname(pk_path) or ".", exist_ok=True)
            with open(pk_path, "wb") as f:
                pickle.dump(pk, f)
        if pinning_path:
            Pinning.from_layout(
                builder.last_layout,
                meta={"circuit": cls.__name__,
                      "spec": getattr(spec, "name", "")}).write(pinning_path)
        return pk

    @classmethod
    def gen_proof(cls, pk: ProvingKey, spec, srs: kzg.SrsKZG,
                  witness, pinning: Optional[Pinning] = None) -> tuple:
        """Returns (proof, instances). pinning: verify the prover-mode
        layout against the keygen-time record (fails loudly on drift)."""
        builder = cls.build(witness, spec)
        cs, fixed, advice, instances = builder.compile(pk.vk.k,
                                                       pinning=pinning)
        proof = create_proof(pk, srs, advice, instances)
        return proof, instances

    @classmethod
    def verify(cls, pk: ProvingKey, srs: kzg.SrsKZG, proof: Proof,
               instances) -> bool:
        return verify_proof(pk.vk, srs, proof, instances)

    # ---- snark / EVM output stages (util/circuit.rs:163-271 analogs) ----
    @classmethod
    def gen_snark(cls, pk: ProvingKey, spec, srs: kzg.SrsKZG,
                  witness, pinning: Optional[Pinning] = None) -> tuple:
        """Inner snark for aggregation: Poseidon-transcript proof
        (gen_snark_shplonk analog). Returns (proof, instances)."""
        builder = cls.build(witness, spec)
        cs, fixed, advice, instances = builder.compile(pk.vk.k,
                                                       pinning=pinning)
        proof = create_proof(pk, srs, advice, instances,
                             transcript="poseidon")
        return proof, instances

    @classmethod
    def gen_evm_proof(cls, pk: ProvingKey, spec, srs: kzg.SrsKZG,
                      witness, pinning: Optional[Pinning] = None) -> tuple:
        """Keccak(EVM)-transcript proof (gen_evm_proof_shplonk analog)."""
        builder = cls.build(witness, spec)
        cs, fixed, advice, instances = builder.compile(pk.vk.k,
                                                       pinning=pinning)
        proof = create_proof(pk, srs, advice, instances,
                             transcript="keccak")
        return proof, instances

    @classmethod
    def gen_evm_verifier(cls, pk: ProvingKey, srs: kzg.SrsKZG,
                         inst_shape, path: Optional[str] = None,
                         accumulator_indices=None,
                         style: str = "looped") -> bytes:
        """EVM verifier bytecode for this circuit's VK
        (gen_evm_verifier_shplonk analog, util/circuit.rs:182-194).
        style: 'looped' (data-driven codegen, one blob, the default),
        'deployable' (EIP-170 split: code + external data contracts,
        the on-chain artifact — writes path + path.dataN alongside), or
        'straight' (fully unrolled; cross-check oracle)."""
        if style == "deployable":
            from ..evm.verifier_loop import gen_evm_verifier_deployable
            dep = gen_evm_verifier_deployable(
                pk.vk, srs, list(inst_shape),
                accumulator_indices=accumulator_indices)
            if path:
                os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
                with open(path, "wb") as f:
                    f.write(dep.code)
                for i, dc in enumerate(dep.data_contracts):
                    with open(f"{path}.data{i}", "wb") as f:
                        f.write(dc)
            return dep
        if style == "looped":
            from ..evm.verifier_loop import (
                gen_evm_verifier_looped as gen_evm_verifier)
        else:
            from ..evm.verifier_gen import gen_evm_verifier
        code = gen_evm_verifier(pk.vk, srs, list(inst_shape),
                                accumulator_indices=accumulator_indices)
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "wb") as f:
                f.write(code)
        return code

    @staticmethod
    def write_calldata(instances, proof: Proof,
                       path: Optional[str] = None) -> bytes:
        """Instances-then-proof calldata (write_calldata_generic analog,
        util/circuit.rs:255-271)."""
        from ..evm.calldata import encode_calldata
        data = encode_calldata(instances, proof.data)
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w") as f:
                f.write("0x" + data.hex())
        return data

    @classmethod
    def evm_verify(cls, verifier_code: bytes, instances,
                   proof: Proof) -> tuple:
        """Run the generated verifier over calldata in the in-process EVM
        (snark-verifier evm_verify analog). Returns (ok, gas_used)."""
        from ..evm.calldata import encode_calldata
        from ..evm.interp import execute
        data = encode_calldata(instances, proof.data)
        res = execute(verifier_code, data)
        return (res.success and res.returndata ==
                (1).to_bytes(32, "big"), res.gas_used)
