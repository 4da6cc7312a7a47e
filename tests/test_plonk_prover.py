"""End-to-end PLONK prove + verify on toy circuits (KZG test SRS)."""
import pytest

from spectre_tpu.fields.params import BN254_FR as FR
from spectre_tpu.plonk import ConstraintSystem
from spectre_tpu.plonk.keygen import keygen
from spectre_tpu.plonk.prover import create_proof, Proof
from spectre_tpu.plonk.verifier import verify_proof
from spectre_tpu.poly import kzg as _kzg

make_srs = _kzg.test_srs

K = 5
N = 1 << K


def _fib_circuit():
    """Fibonacci-ish chain: rows of (s, a, b, c) with s*(a+b-c)=0 plus copy
    constraints c[i] == b[i+1], b[i] == a[i+1], and c exposed to an instance."""
    cs = ConstraintSystem()
    s = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    c = cs.advice_column()
    pi = cs.instance_column()
    for col in (a, b, c, pi):
        cs.enable_equality(col)
    cs.create_gate("add", s.at() * (a.at() + b.at() - c.at()))
    return cs, (s, a, b, c, pi)


def _fib_assign(rows):
    a, b = 1, 1
    s_col, a_col, b_col, c_col = [], [], [], []
    for _ in range(rows):
        c = (a + b) % FR
        s_col.append(1)
        a_col.append(a)
        b_col.append(b)
        c_col.append(c)
        a, b = b, c
    return s_col, a_col, b_col, c_col


@pytest.fixture(scope="module")
def setup():
    cs, (s, a, b, c, pi) = _fib_circuit()
    rows = 8
    s_col, a_col, b_col, c_col = _fib_assign(rows)
    for i in range(rows - 1):
        cs.copy((c.index, i), (b.index, i + 1))
        cs.copy((b.index, i), (a.index, i + 1))
    # expose the final value as instance[0]
    cs.copy((c.index, rows - 1), (pi.index, 0))
    srs = make_srs(K)
    pk = keygen(cs, K, [s_col + [0] * (N - rows)], srs)
    final = c_col[-1]
    advice = [a_col, b_col, c_col]
    return cs, srs, pk, advice, [[final]], (a, b, c, pi)


def test_prove_and_verify(setup):
    cs, srs, pk, advice, instances, _ = setup
    proof = create_proof(pk, srs, advice, instances)
    assert verify_proof(pk.vk, srs, proof, instances)


def test_verify_rejects_wrong_instance(setup):
    cs, srs, pk, advice, instances, _ = setup
    proof = create_proof(pk, srs, advice, instances)
    bad = [[(instances[0][0] + 1) % FR]]
    assert not verify_proof(pk.vk, srs, proof, bad)


def test_verify_rejects_tampered_proof(setup):
    cs, srs, pk, advice, instances, _ = setup
    proof = create_proof(pk, srs, advice, instances)
    data = bytearray(proof.data)
    data[40] ^= 1
    try:
        ok = verify_proof(pk.vk, srs, Proof(bytes(data)), instances)
    except AssertionError:
        ok = False  # malformed encodings are also a rejection
    assert not ok


def test_prover_rejects_cheating_witness(setup):
    """A witness violating a copy constraint must fail verification."""
    cs, srs, pk, advice, instances, _ = setup
    bad_advice = [list(c) for c in advice]
    bad_advice[2][3] = (bad_advice[2][3] + 1) % FR  # break chain at row 3
    proof = create_proof(pk, srs, bad_advice, instances)
    assert not verify_proof(pk.vk, srs, proof, instances)


def test_gwc_scheme_roundtrip(setup):
    """The GWC multiopen path stays supported behind scheme='gwc'."""
    cs, srs, pk, advice, instances, _ = setup
    proof = create_proof(pk, srs, advice, instances, scheme="gwc")
    assert verify_proof(pk.vk, srs, proof, instances, scheme="gwc")
    assert not verify_proof(pk.vk, srs, proof, instances)  # scheme mismatch


@pytest.mark.heavy
def test_wide_circuit_sliced_grand_products():
    """Wide-permutation regression: ~200 equality-enabled columns at k=5
    produce ~200 permutation chunks (chunk_len = degree-2 = 1), forcing the
    batched grand-product pass to slice to the col_chunk budget (64 at this
    n). One fused program over every chunk OOMed the 16 GB chip on the
    795-advice aggregation circuit; this pins the sliced path end-to-end."""
    cs = ConstraintSystem()
    s = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    c = cs.advice_column()
    pi = cs.instance_column()
    for col in (a, b, c, pi):
        cs.enable_equality(col)
    cs.create_gate("add", s.at() * (a.at() + b.at() - c.at()))
    wide = [cs.advice_column() for _ in range(200)]
    for col in wide:
        cs.enable_equality(col)
    # chain a copy through the wide columns so the permutation is nontrivial
    for w1, w2 in zip(wide, wide[1:]):
        cs.copy((w1.index, 0), (w2.index, 0))

    rows = 8
    s_col, a_col, b_col, c_col = _fib_assign(rows)
    for i in range(rows - 1):
        cs.copy((c.index, i), (b.index, i + 1))
        cs.copy((b.index, i), (a.index, i + 1))
    cs.copy((c.index, rows - 1), (pi.index, 0))
    srs = make_srs(K)
    pk = keygen(cs, K, [s_col + [0] * (N - rows)], srs)
    advice = [a_col, b_col, c_col] + [[7] * rows for _ in wide]
    instances = [[c_col[-1]]]
    proof = create_proof(pk, srs, advice, instances)
    assert verify_proof(pk.vk, srs, proof, instances)


def test_keygen_checkpoint_resume(setup, tmp_path):
    """A keygen killed mid-way resumes from its checkpoint and produces the
    identical key (VERDICT r3: step-nano keygen DNF left nothing durable)."""
    import pickle

    from spectre_tpu.plonk.keygen import _build_permutation, _ckpt_tag

    cs, srs, pk, advice, instances, _ = setup
    fixed = [list(pk.fixed_evals[0])]
    ckpt = str(tmp_path / "kg.ckpt")

    # full keygen with checkpointing: same commitments, checkpoint removed
    pk2 = keygen(cs, K, fixed, srs, checkpoint=ckpt)
    assert pk2.vk.fixed_commitments == pk.vk.fixed_commitments
    assert pk2.vk.sigma_commitments == pk.vk.sigma_commitments
    import os
    assert not os.path.exists(ckpt)

    # simulate a kill after the first commits: seed a truncated checkpoint
    mapping = _build_permutation(cs, 1 << K)
    tag = _ckpt_tag(K, len(fixed), mapping)
    all_comms = pk.vk.fixed_commitments + pk.vk.sigma_commitments
    with open(ckpt, "wb") as f:
        pickle.dump({"tag": tag, "comms": all_comms[:2]}, f)
    pk3 = keygen(cs, K, fixed, srs, checkpoint=ckpt)
    assert pk3.vk.fixed_commitments == pk.vk.fixed_commitments
    assert pk3.vk.sigma_commitments == pk.vk.sigma_commitments

    # a stale checkpoint (wrong tag) restarts cleanly instead of mixing keys
    with open(ckpt, "wb") as f:
        pickle.dump({"tag": "bogus", "comms": [all_comms[1]]}, f)
    pk4 = keygen(cs, K, fixed, srs, checkpoint=ckpt)
    assert pk4.vk.fixed_commitments == pk.vk.fixed_commitments


def test_host_staged_quotient_stack(setup, monkeypatch):
    """Force the big-k host-staged coefficient-stack path (the k>=17 OOM
    fix: chunks round-trip through host RAM, sigma coefficients come from
    the PK's prove-invariant host cache) and check the proof still
    verifies — parity with the device-concat path."""
    cs, srs, pk, advice, instances, _ = setup
    monkeypatch.setenv("SPECTRE_HOST_STAGE_N", "1")   # always stage
    proof = create_proof(pk, srs, advice, instances)
    assert verify_proof(pk.vk, srs, proof, instances)
    # second prove hits the cached host sigma stack
    assert getattr(pk, "_sigma_i16_host", None) is not None
    proof2 = create_proof(pk, srs, advice, instances)
    assert verify_proof(pk.vk, srs, proof2, instances)


def test_lazy_subcoset_columns(setup, monkeypatch):
    """Force the lazy sub-coset column path (the step-k=17 OOM #8 fix:
    above _UNSTACK_EAGER_MAX_B the quotient loop slices columns from the
    live stack instead of eager-unstacking a full per-column copy) and
    check proof parity with the eager path."""
    from spectre_tpu.plonk import prover as P
    cs, srs, pk, advice, instances, _ = setup
    monkeypatch.setattr(P, "_UNSTACK_EAGER_MAX_B", 0)   # always lazy
    proof = create_proof(pk, srs, advice, instances, seed=b"\x11" * 32)
    assert verify_proof(pk.vk, srs, proof, instances)
    monkeypatch.setattr(P, "_UNSTACK_EAGER_MAX_B", 1 << 30)
    proof_eager = create_proof(pk, srs, advice, instances,
                               seed=b"\x11" * 32)
    assert proof.data == proof_eager.data   # bit-identical transcripts


def test_host_resident_coeff_stack(setup, monkeypatch):
    """Force the host-resident coefficient stack (step-k=17 OOM #9 fix:
    above _COEFF_HOST_MAX_B the quotient keeps the stack in host RAM and
    coset_ntt_many_hosted re-uploads it chunk-wise into a donated
    preallocated sub-coset stack) and check bit-identical proofs."""
    from spectre_tpu.plonk import prover as P
    cs, srs, pk, advice, instances, _ = setup
    monkeypatch.setenv("SPECTRE_HOST_STAGE_N", "1")   # staged assembly
    monkeypatch.setattr(P, "_COEFF_HOST_MAX_B", 0)    # always host
    monkeypatch.setattr(P, "_UNSTACK_EAGER_MAX_B", 0)  # lazy cols too
    proof = create_proof(pk, srs, advice, instances, seed=b"\x22" * 32)
    assert verify_proof(pk.vk, srs, proof, instances)
    monkeypatch.setattr(P, "_COEFF_HOST_MAX_B", 1 << 31)
    monkeypatch.setattr(P, "_UNSTACK_EAGER_MAX_B", 1 << 30)
    proof_dev = create_proof(pk, srs, advice, instances, seed=b"\x22" * 32)
    assert proof.data == proof_dev.data


def test_membudget_static_estimate():
    """The static HBM model must produce sane, monotone phase estimates
    for a compiled system (the pre-window budget check, VERDICT r4 #4)."""
    from spectre_tpu.circuits.builder import CircuitBuilder
    from spectre_tpu.plonk import membudget

    b = CircuitBuilder()
    ctx = b.main()
    x = ctx.assign(3)
    for _ in range(20):
        x = ctx.mul(x, x)
    b.expose_public(x)
    cs, *_ = b.compile(6)
    est = membudget.estimate(cs, 6)
    assert est["peak"] == max(v for k_, v in est.items()
                              if k_ not in ("peak", "C_total"))
    assert est["C_total"] > len(cs.advice)
    # tiny circuit fits a chip with big margin
    membudget.assert_fits(cs, 6)
    # scaling k by 4 scales every phase ~16x
    est2 = membudget.estimate(cs, 10)
    assert est2["peak"] > 10 * est["peak"]
    assert "GiB" in membudget.report(cs, 6)
