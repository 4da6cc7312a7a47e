#!/usr/bin/env python3
"""Full compression pipeline (the reference's production path shape,
rpc.rs:144-160): inner snark (Poseidon transcript) -> AggregationCircuit
(in-circuit SHPLONK verify, accumulator exposed) -> real aggregation proof
(Keccak/EVM transcript) -> generated EVM verifier executed in the
interpreter over encode_calldata output.

Usage: python scripts/prove_aggregation.py [--k K] [--platform cpu|tpu]
Prints one JSON summary line.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--inner-k", type=int, default=5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    t_start = time.time()

    def log(m):
        print(f"[{time.time()-t_start:7.1f}s] {m}", flush=True)

    from spectre_tpu.circuits.builder import CircuitBuilder
    from spectre_tpu.circuits.range_chip import RangeChip
    from spectre_tpu.circuits.aggregation import (
        build_aggregation, aggregation_instances, AggregationWitness,
        ACC_INDICES)
    from spectre_tpu.plonk.keygen import keygen
    from spectre_tpu.plonk.prover import create_proof
    from spectre_tpu.plonk.verifier import verify_proof
    from spectre_tpu.poly import kzg
    from spectre_tpu.evm.verifier_gen import gen_evm_verifier
    from spectre_tpu.evm.calldata import encode_calldata
    from spectre_tpu.evm.interp import execute

    # ---- inner snark ----
    b = CircuitBuilder()
    rc = RangeChip(b, 3)
    ctx = b.main()
    x = ctx.assign(5)
    y = ctx.assign(7)
    s = ctx.add(x, y)
    p = ctx.mul(s, s)
    rc.range_check(ctx, x, 3)
    b.expose_public(p)
    cs_i, fixed_i, advice_i, inst_i = b.compile(args.inner_k)
    srs_i = kzg.test_srs(args.inner_k)
    pk_i = keygen(cs_i, args.inner_k, fixed_i, srs_i)
    inner_proof = create_proof(pk_i, srs_i, advice_i, inst_i,
                               transcript="poseidon")
    assert verify_proof(pk_i.vk, srs_i, inner_proof, inst_i,
                        transcript="poseidon")
    log(f"inner snark: k={args.inner_k}, {len(inner_proof.data)} bytes")

    # ---- aggregation circuit ----
    builder = build_aggregation(pk_i.vk,
                                AggregationWitness(inner_proof.data, inst_i))
    want = aggregation_instances(pk_i.vk, inner_proof.data, inst_i)
    assert builder.instances() == want, "accumulator parity"
    log(f"aggregation circuit built: {len(builder.main().cells)} cells")

    cs, fixed, advice, instances = builder.compile(args.k)
    log(f"compiled k={args.k}: advice={len(cs.advice)} fixed={len(cs.fixed)}")

    srs = kzg.cached_srs(args.k)
    log("srs ready")
    t0 = time.time()
    pk = keygen(cs, args.k, fixed, srs)
    t_kg = time.time() - t0
    log(f"keygen done ({t_kg:.1f}s)")

    t0 = time.time()
    proof = create_proof(pk, srs, advice, instances, transcript="keccak")
    t_prove = time.time() - t0
    log(f"aggregation proof: {len(proof.data)} bytes ({t_prove:.1f}s)")

    ok_native = verify_proof(pk.vk, srs, proof, instances,
                             transcript="keccak",
                             accumulator_indices=ACC_INDICES)
    log(f"native verify (with accumulator fold): {ok_native}")

    t0 = time.time()
    code = gen_evm_verifier(pk.vk, srs, [len(c) for c in instances],
                            accumulator_indices=ACC_INDICES)
    log(f"EVM verifier: {len(code)} bytes codegen ({time.time()-t0:.1f}s)")
    cd = encode_calldata(instances, proof.data)
    t0 = time.time()
    r = execute(code, cd)
    log(f"EVM verify: success={r.success} gas={r.gas_used} "
        f"({time.time()-t0:.1f}s)")

    print(json.dumps({
        "pipeline": "inner->aggregation->evm",
        "inner_k": args.inner_k, "k": args.k,
        "agg_cells": len(builder.main().cells),
        "agg_proof_bytes": len(proof.data),
        "calldata_bytes": len(cd),
        "verifier_code_bytes": len(code),
        "evm_gas": r.gas_used,
        "keygen_s": round(t_kg, 1),
        "prove_s": round(t_prove, 1),
        "native_ok": bool(ok_native),
        "evm_ok": bool(r.success),
    }))
    return 0 if (ok_native and r.success) else 1


if __name__ == "__main__":
    sys.exit(main())
