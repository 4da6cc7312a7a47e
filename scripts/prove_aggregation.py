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


def _committee_nano_inner(inner_k: int, log, thin: bool = False):
    """REAL inner snark: CommitteeUpdateCircuit at nano (4 keys), Poseidon
    transcript — the app-circuit stage of the reference's compressed
    pipeline (rpc.rs:144-149). PK and proof are disk-cached in build/ so
    the aggregation stage can iterate without re-proving.

    thin: use the flex-SHA thin layout (CommitteeUpdateCircuitThin) — at
    k>=18 the inner VK collapses to tens of polys, which is what makes
    the aggregation stage affordable (VERDICT r3 next #5)."""
    import pickle
    import random
    from spectre_tpu.specs import Spec
    from spectre_tpu import ssz
    from spectre_tpu.curves import host as H
    from spectre_tpu.witness.rotation import CommitteeUpdateArgs
    from spectre_tpu.circuits.committee_update import (
        CommitteeUpdateCircuit, CommitteeUpdateCircuitThin)
    from spectre_tpu.plonk.verifier import verify_proof
    from spectre_tpu.poly import kzg
    if thin:
        CommitteeUpdateCircuit = CommitteeUpdateCircuitThin  # noqa: F811

    spec = Spec(name="nano", sync_committee_size=4)
    rng = random.Random(42)
    pts = [H.bls_g1.mul(H.bls_g1.gen, rng.randrange(1, 1 << 64))
           for _ in range(spec.sync_committee_size)]
    pubkeys = [H.g1_compress(p) for p in pts]
    pk_root = ssz.sync_committee_pubkeys_root(pubkeys)
    branch = [bytes([rng.randrange(256) for _ in range(32)])
              for _ in range(spec.sync_committee_pubkeys_depth)]
    state_root = ssz.mock_root(pk_root, branch,
                               spec.sync_committee_pubkeys_root_index)
    header = ssz.BeaconBlockHeader(slot=1234, state_root=state_root)
    wit = CommitteeUpdateArgs(pubkeys_compressed=pubkeys,
                              finalized_header=header,
                              sync_committee_branch=branch, spec=spec)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    srs = kzg.cached_srs(inner_k)
    variant = "nano_thin" if thin else "nano"
    pk_path = os.path.join(repo, "build",
                           f"committee_{variant}_k{inner_k}_pk.pkl")
    pk_i = CommitteeUpdateCircuit.create_pk(spec, inner_k, srs,
                                            pk_path=pk_path, witness=wit)
    log(f"inner committee-nano pk ready (k={inner_k})")

    proof_path = os.path.join(
        repo, "build",
        f"committee_{variant}_k{inner_k}_poseidon_proof.pkl")
    builder = CommitteeUpdateCircuit.build(wit, spec)
    inst_i = builder.instances()
    if os.path.exists(proof_path):
        with open(proof_path, "rb") as f:
            inner_proof = pickle.load(f)
    else:
        inner_proof, got = CommitteeUpdateCircuit.gen_snark(
            pk_i, spec, srs, wit)
        assert got == inst_i, "instance parity"
        with open(proof_path, "wb") as f:
            pickle.dump(inner_proof, f)
    assert verify_proof(pk_i.vk, srs, inner_proof, inst_i,
                        transcript="poseidon"), "inner verify"
    log(f"inner snark ready: k={inner_k}, {len(inner_proof.data)} bytes")
    return inst_i, pk_i, inner_proof


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--inner-k", type=int, default=5)
    ap.add_argument("--inner", default="toy",
                    choices=["toy", "committee-nano",
                             "committee-nano-thin"],
                    help="inner snark: 'toy' (k=5 gate circuit) or "
                         "'committee-nano' — the REAL CommitteeUpdate "
                         "circuit at the 4-key nano spec (inner-k=13), "
                         "i.e. the rpc.rs:144-160 production pipeline "
                         "shape end-to-end")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--verifier", default="looped",
                    choices=["looped", "straight"],
                    help="EVM verifier codegen (looped = deployable size)")
    ap.add_argument("--budget-only", action="store_true",
                    help="build the aggregation circuit, print its cell "
                         "count + minimal k, and exit before any keygen")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    t_start = time.time()

    def log(m):
        print(f"[{time.time()-t_start:7.1f}s] {m}", flush=True)

    from spectre_tpu.jax_cache import enable as _enable_cache
    _enable_cache()
    from spectre_tpu.circuits.builder import CircuitBuilder
    from spectre_tpu.circuits.range_chip import RangeChip
    from spectre_tpu.circuits.aggregation import (
        build_aggregation, aggregation_instances, AggregationWitness,
        ACC_INDICES)
    from spectre_tpu.plonk.keygen import keygen
    from spectre_tpu.plonk.prover import create_proof
    from spectre_tpu.plonk.verifier import verify_proof
    from spectre_tpu.poly import kzg
    if args.verifier == "looped":
        from spectre_tpu.evm.verifier_loop import (
            gen_evm_verifier_looped as gen_evm_verifier)
    else:
        from spectre_tpu.evm.verifier_gen import gen_evm_verifier
    from spectre_tpu.evm.calldata import encode_calldata
    from spectre_tpu.evm.interp import execute

    # ---- inner snark ----
    if args.inner == "committee-nano":
        args.inner_k = max(args.inner_k, 13)
        inst_i, pk_i, inner_proof = _committee_nano_inner(args.inner_k, log)
    elif args.inner == "committee-nano-thin":
        args.inner_k = max(args.inner_k, 16)
        inst_i, pk_i, inner_proof = _committee_nano_inner(
            args.inner_k, log, thin=True)
    else:
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
    n_cells = len(builder.main().cells)
    log(f"aggregation circuit built: {n_cells} cells")
    if args.budget_only:
        print(json.dumps({"inner": args.inner, "inner_k": args.inner_k,
                          "agg_cells": n_cells}))
        return 0

    cs, fixed, advice, instances = builder.compile(args.k)
    log(f"compiled k={args.k}: advice={len(cs.advice)} fixed={len(cs.fixed)}")

    srs = kzg.cached_srs(args.k)
    log("srs ready")
    import pickle
    # cache key includes the cell count: in-circuit verifier cell counts
    # are (slightly) proof-value-dependent for unseeded toy inners, and a
    # PK keyed only by (inner, k) could silently pair with a shifted
    # layout. Production uses AggregationCircuit.create_pk over a dummy
    # snark, which is layout-stable.
    pk_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "build", f"agg_{args.inner}_k{args.k}_c{n_cells}_pk.pkl")
    t0 = time.time()
    if os.path.exists(pk_path):
        with open(pk_path, "rb") as f:
            pk = pickle.load(f)
        t_kg = time.time() - t0
        log(f"agg pk loaded from cache ({t_kg:.1f}s)")
    else:
        pk = keygen(cs, args.k, fixed, srs, checkpoint=pk_path + ".ckpt")
        t_kg = time.time() - t0
        with open(pk_path, "wb") as f:
            pickle.dump(pk, f)
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
        "verifier_style": args.verifier,
        "eip170_ok": len(code) <= 24576,
        "evm_gas": r.gas_used,
        "keygen_s": round(t_kg, 1),
        "prove_s": round(t_prove, 1),
        "native_ok": bool(ok_native),
        "evm_ok": bool(r.success),
    }))
    return 0 if (ok_native and r.success) else 1


if __name__ == "__main__":
    sys.exit(main())
