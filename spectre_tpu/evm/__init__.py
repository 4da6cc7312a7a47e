"""Self-contained EVM layer: assembler, interpreter, verifier codegen.

The reference delegates this to snark-verifier's Yul generator + revm
(aggregation_circuit.rs:15-18, util/circuit.rs:182-194). This environment
has neither solc nor revm, so the rebuild carries its own minimal stack:

  * asm.py           — EVM bytecode assembler (labels, auto-sized PUSH)
  * interp.py        — EVM interpreter with the BN254 precompiles
                       (ecAdd/ecMul/ecPairing, modexp) + keccak256 and
                       mainnet gas costs — the revm/anvil analog for
                       contract tests
  * verifier_gen.py  — generates a standalone verifier program for a
                       VerifyingKey (gen_evm_verifier_shplonk analog)
  * calldata.py      — instance/proof calldata encoding
                       (encode_calldata analog, util/circuit.rs:255-271)
"""
from .asm import Asm
from .interp import execute, EvmResult
