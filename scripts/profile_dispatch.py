#!/usr/bin/env python3
"""Dispatch-count profiler for the prover pipeline.

The tunnel TPU costs ~35-40 ms per device dispatch (jit execution OR eager
primitive) and per host transfer, so wall-clock at small k is dominated by
DISPATCH COUNT, not FLOPs. This script runs the committee-update prove on
CPU with instrumentation that counts, per create_proof phase:

  * jit executions (each = 1 device program dispatch)
  * eager primitive applications (each = 1 dispatch on the tunnel)
  * host->device / device->host transfers

Usage: python scripts/profile_dispatch.py [--spec nano] [--k 13]
"""
import argparse
import collections
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# FORCE cpu: the session shell exports JAX_PLATFORMS=axon (tunnel TPU) and
# a profiler must never contend with real TPU jobs
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

COUNTS = collections.Counter()
PHASE = ["<init>"]
PER_PHASE = collections.defaultdict(collections.Counter)


def bump(kind, name=""):
    COUNTS[kind] += 1
    PER_PHASE[PHASE[0]][kind] += 1
    if name:
        PER_PHASE[PHASE[0]][f"{kind}:{name}"] += 1


# --- hook jit executions (only real dispatches: skip calls made while an
# outer jit is tracing — those inline into the outer program) ---
try:
    from jax._src.core import trace_state_clean as _ts_clean
except ImportError:  # jax version drift
    def _ts_clean():
        return True

_orig_jit = jax.jit


def counting_jit(f, *a, **k):
    g = _orig_jit(f, *a, **k)
    name = getattr(f, "__name__", "?")

    def wrapper(*args, **kwargs):
        if _ts_clean():
            bump("jit", name)
        else:
            bump("traced", name)
        return g(*args, **kwargs)

    wrapper.lower = g.lower
    return wrapper


jax.jit = counting_jit

# --- hook eager primitive dispatch ---
from jax._src import dispatch as _dispatch  # noqa: E402

_orig_apply = _dispatch.apply_primitive


def counting_apply(prim, *args, **kwargs):
    bump("eager", prim.name)
    return _orig_apply(prim, *args, **kwargs)


_dispatch.apply_primitive = counting_apply
# jnp ops resolve apply_primitive through Primitive.bind -> impl; patch the
# xla impl registry reference too if present
try:
    import jax._src.core as _core
    if getattr(_core.Primitive, "impl", None):
        pass
except Exception:
    pass

# --- hook transfers ---
_orig_put = jax.device_put


def counting_put(*a, **k):
    bump("device_put")
    return _orig_put(*a, **k)


jax.device_put = counting_put

import numpy as _np  # noqa: E402

_orig_asarray = _np.asarray


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spec", default="nano")
    ap.add_argument("--k", type=int, default=13)
    args = ap.parse_args()

    import random
    from spectre_tpu.specs import Spec, MINIMAL
    from spectre_tpu import ssz
    from spectre_tpu.curves import host as H
    from spectre_tpu.witness.rotation import CommitteeUpdateArgs
    from spectre_tpu.circuits.committee_update import CommitteeUpdateCircuit
    from spectre_tpu.plonk.keygen import keygen
    from spectre_tpu.plonk import prover as P
    from spectre_tpu.poly import kzg
    from spectre_tpu import metrics

    # phase hook: counts accumulate under the running "current" bucket; when
    # tm(phase) fires the bucket is renamed to that phase (a phase's work is
    # everything since the previous tm call)
    orig_call = metrics.PhaseRecorder.__call__

    def patched_call(self, phase):
        orig_call(self, phase)
        if "current" in PER_PHASE:
            PER_PHASE[phase].update(PER_PHASE.pop("current"))

    metrics.PhaseRecorder.__call__ = patched_call

    if args.spec == "nano":
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
        witness = CommitteeUpdateArgs(
            pubkeys_compressed=pubkeys, finalized_header=header,
            sync_committee_branch=branch, spec=spec)
    else:
        spec = MINIMAL
        witness = CommitteeUpdateArgs.default(spec)

    t0 = time.time()
    builder = CommitteeUpdateCircuit.build(witness, spec)
    cs, fixed, advice, instances = builder.compile(args.k)
    print(f"built+compiled {time.time()-t0:.1f}s: advice={len(cs.advice)} "
          f"fixed={len(cs.fixed)} copies={len(cs.copies)}", flush=True)

    srs = kzg.cached_srs(args.k)
    PHASE[0] = "keygen"
    t0 = time.time()
    pk = keygen(cs, args.k, fixed, srs)
    print(f"keygen {time.time()-t0:.1f}s", flush=True)

    PHASE[0] = "current"
    t0 = time.time()
    P.create_proof(pk, srs, advice, instances, seed=b"profile")
    print(f"prove {time.time()-t0:.1f}s", flush=True)

    print("\n=== per-phase dispatch counts ===")
    # relabel: counters keyed "X|next" accumulated during the phase that
    # ENDS at tm("X")... actually with the patched __call__ the phase label
    # switches right after tm(phase) fires, so counts under "X|next" belong
    # to the phase AFTER X. Print raw with that caveat.
    for phase, ctr in PER_PHASE.items():
        total = ctr.get("jit", 0) + ctr.get("eager", 0)
        print(f"\n-- {phase}  (dispatches={total}, "
              f"puts={ctr.get('device_put', 0)})")
        for key, n in ctr.most_common(30):
            if ":" in key:
                print(f"   {key:50s} {n}")
    print("\n=== totals ===")
    for k_, v in COUNTS.most_common():
        print(f"  {k_:12s} {v}")


if __name__ == "__main__":
    main()
