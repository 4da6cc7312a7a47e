"""spectre_tpu — a TPU-native Halo2-class proving stack for Ethereum light clients.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ChainSafe/Spectre
(reference: /root/reference): PLONKish (Halo2) proving over BN254 with KZG
commitments, in-circuit BLS12-381 aggregate-signature / SHA-256 / Poseidon
gadgets, the sync-step and committee-update application circuits, an
aggregation/compression stage, and the surrounding witness/preprocessor/
service layers.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  fields/   limb-decomposed modular arithmetic (host oracle + JAX int32 kernels)
  curves/   BN254 G1, BLS12-381 G1/G2 (branch-free complete-addition on TPU)
  hashes/   SHA-256, Keccak-256, Poseidon (grain-LFSR params, pse-poseidon
            compatible sponge)
  poly/     NTT, Pippenger MSM, KZG/SHPLONK commitment scheme
  plonk/    PLONKish constraint system, keygen, prover, verifier, MockProver
  circuits/ circuit-builder DSL (halo2-lib-style) + gadgets + app circuits
  witness/  SyncStepArgs / CommitteeUpdateArgs (serde-JSON compatible)
  preprocessor/  beacon-chain witness acquisition
  service/  CLI + JSON-RPC prover service
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the limb-arithmetic graphs (unrolled
# 24-iteration REDC inside every mont_mul) are compile-heavy; caching them
# on disk makes repeated test/bench runs start warm. Also covers the
# tunnel-attached TPU, whose compile latency is highly variable.
import os as _os


def _enable_compile_cache():
    try:
        # skip on the CPU backend: XLA:CPU AOT caches pin host ISA features
        # and can SIGILL when loaded on a different machine; CPU compiles
        # are cheap anyway. (TPU/axon compiles are the expensive ones.)
        if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
            return
        import jax
        cache_dir = _os.environ.get(
            "SPECTRE_JAX_CACHE", _os.path.expanduser("~/.cache/spectre_jax"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.4)
    except Exception:
        pass


_enable_compile_cache()
