"""Static per-phase HBM budget for create_proof (VERDICT r4 weak #4).

Round 4 found k=18 memory limits by seven consecutive on-chip OOMs. This
module predicts the dominant per-phase HBM residency from the compiled
constraint system BEFORE a long window is committed, so a new circuit
shape can be budget-checked in milliseconds instead of hours.

The model tracks the tensors create_proof actually keeps live (see
prover.py:614-1120):

  srs_enc        3x(NL, n) int32 Lagrange basis (resident during commits)
  pk_coeffs      (F + P)x(NL, n) int16 fixed+sigma coefficient stacks
  col_evals      (A + F)x(NL, n) int32 eval-form columns (phases 1-3)
  gp_transient   grand-product scan temps: ~6 live copies per blocked
                 column chunk (col_chunk(n) columns x 96 B/row each)
  coeff_stack    (C_total, NL, n) int16 — the single coefficient tensor
  subcoset       a SECOND (C_total, NL, n) int16 per sub-coset j
  gate_transient stacked gate-fold input, capped at 2^27 B by _GROUP_W
  ntt_transient  coset-NTT REDC temps: ~400 B/row x col_chunk(n) cols,
                 capped at 2^28 B (fr_vec.col_chunk)

C_total = (A + F) cols + perm-z chunks + 3 per lookup + 3 indicators
          + P sigmas (prover.py:903-934).
"""
from __future__ import annotations

from typing import Dict

NL = 24            # BN254 Fr 2^11 limbs
HBM_BYTES = 16 << 30   # TPU v5e single chip


def _unstack_eager_max() -> int:
    from .prover import _UNSTACK_EAGER_MAX_B
    return _UNSTACK_EAGER_MAX_B


def _coeff_host_max() -> int:
    from .prover import _COEFF_HOST_MAX_B
    return _COEFF_HOST_MAX_B


def _col_chunk(n: int, bytes_per_row: int = 400, cap: int = 1 << 28) -> int:
    w = max(1, min(64, cap // max(n * bytes_per_row, 1)))
    return 1 << (w.bit_length() - 1)


def estimate(cs, k: int) -> Dict[str, int]:
    """Per-phase dominant HBM residency (bytes) for create_proof over
    the compiled ConstraintSystem `cs` at degree k."""
    n = 1 << k
    A = len(cs.advice)
    F = len(cs.fixed)
    P = len(cs.permutation_columns)
    nL = len(cs.lookups)
    from .prover import _cs_degree
    d = _cs_degree(cs)
    chunk_len = max(1, d - 2)
    n_chunks = (P + chunk_len - 1) // chunk_len
    C_total = (A + F) + n_chunks + 3 * nL + 3 + P

    col32 = NL * n * 4          # one int32 column
    col16 = NL * n * 2          # one int16 column
    srs_enc = 3 * col32
    pk_coeffs = (F + P) * col16
    col_evals = (A + F) * col32
    gp_block = _col_chunk(n)
    gp_transient = 6 * gp_block * col32
    coeff_stack = C_total * col16
    gate_transient = min(1 << 27, 8 * col32 * 4)
    ntt_transient = min(1 << 28, _col_chunk(n) * 400 * n)
    hosted = coeff_stack > _coeff_host_max()
    dev_coeff = 0 if hosted else coeff_stack

    phases = {
        "p1_advice_commit": srs_enc + pk_coeffs + col_evals,
        "p2_grand_products": (srs_enc + pk_coeffs + col_evals
                              + (n_chunks + 3 * nL) * col32
                              + gp_transient),
        "p3_coeff_stack": (pk_coeffs + col_evals // 2 + dev_coeff
                           + ntt_transient),
        # device terms: all_coeffs (device mode only) + sub_all
        # + coset_ntt_many's chunk-concat copy (device mode only;
        # the hosted variant assembles via donated in-place updates)
        # + the eager-unstack per-column copy when small enough for the
        # one-dispatch path (OOM #8/#9 fixes)
        "p4_quotient_subcoset": (dev_coeff + coeff_stack
                                 + (0 if hosted else coeff_stack)
                                 + (coeff_stack if coeff_stack
                                    <= _unstack_eager_max() else 0)
                                 + gate_transient + ntt_transient
                                 + 4 * col32),               # acc + temps
        "p5_evaluations": coeff_stack + C_total * col16 // 2,
        "p6_multiopen": srs_enc + coeff_stack + 6 * col32,
    }
    phases["peak"] = max(phases.values())
    phases["C_total"] = C_total
    return phases


def report(cs, k: int, hbm: int = HBM_BYTES) -> str:
    est = estimate(cs, k)
    lines = [f"HBM budget (k={k}, C_total={est['C_total']}, "
             f"chip={hbm / 2**30:.0f} GiB):"]
    for name, b in est.items():
        if name in ("peak", "C_total"):
            continue
        flag = " !! OVER" if b > hbm else ""
        lines.append(f"  {name:24s} {b / 2**30:7.2f} GiB{flag}")
    lines.append(f"  {'peak':24s} {est['peak'] / 2**30:7.2f} GiB "
                 f"({100 * est['peak'] / hbm:.0f}% of chip)")
    return "\n".join(lines)


def assert_fits(cs, k: int, hbm: int = HBM_BYTES, slack: float = 0.9):
    """Raise before launching a prove whose static peak exceeds
    slack*HBM. Returns the estimate dict."""
    est = estimate(cs, k)
    if est["peak"] > slack * hbm:
        raise MemoryError(
            f"static HBM budget: peak {est['peak'] / 2**30:.2f} GiB "
            f"> {slack:.0%} of {hbm / 2**30:.0f} GiB chip\n" +
            report(cs, k, hbm))
    return est
