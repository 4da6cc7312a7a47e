"""PLONK verifier (native host). KZG openings are checked with ONE batched
BN254 pairing product (kzg.verify_open_batch) — sound for any SRS; the
trapdoor fast path must be requested explicitly and only works on test SRS."""
from __future__ import annotations

from typing import Dict, List, Tuple

from ..fields.params import BN254_FR as FR
from ..fields.host import inv_mod
from ..curves import host as H
from ..poly import kzg
from .cs import ConstraintSystem
from .keygen import VerifyingKey, DELTA
from .transcript import Blake2bTranscript, ProofError
from .protocol import (column_queries, eval_expr_at, lagrange_evals_at,
                       instance_poly_eval)
from .prover import _cs_degree, Proof


def verify_proof(vk: VerifyingKey, srs: kzg.SrsKZG, proof: Proof,
                 instances: List[List[int]], trapdoor: bool = False,
                 scheme: str = "shplonk",
                 transcript: str = "blake2b",
                 accumulator_indices=None) -> bool:
    """Verify a proof. trapdoor=True uses the pairing-free test-SRS check
    (requires srs.tau; test-only; GWC scheme only). transcript must match
    the prover's ("blake2b" native / "keccak" EVM flavor / "poseidon"
    aggregation flavor). accumulator_indices: [(col, row), ...] of the 12
    KZG-accumulator limbs an aggregation circuit exposes (88-bit limbs,
    lhs.x/lhs.y/rhs.x/rhs.y order) — the accumulated pair is folded into
    this proof's own pairing check with verifier randomness."""
    try:
        return _verify_proof(vk, srs, proof, instances, trapdoor, scheme,
                             transcript, accumulator_indices)
    except ProofError:
        return False


def accumulator_from_instances(instances: List[List[int]],
                               accumulator_indices) -> tuple:
    """Reconstruct ((lhs, rhs)) G1 points from 12 exposed 88-bit limbs."""
    from ..fields.params import BN254_FQ as FQ
    vals = [instances[c][r] for (c, r) in accumulator_indices]
    assert len(vals) == 12
    coords = []
    for i in range(4):
        limbs = vals[3 * i:3 * i + 3]
        coords.append(sum(int(l) << (88 * j) for j, l in enumerate(limbs)))
    for c in coords:
        if c >= FQ:
            raise ProofError("accumulator limb out of field range")
    lhs = (coords[0], coords[1])
    rhs = (coords[2], coords[3])
    curve = H.bn254_g1
    for (x, y) in (lhs, rhs):
        if (y * y - (x * x % FQ * x + 3)) % FQ != 0:
            raise ProofError("accumulator point not on curve")
    return lhs, rhs


def build_claims(vk: VerifyingKey, proof: Proof,
                 instances: List[List[int]],
                 transcript: str = "blake2b"):
    """Run the scalar half of verification: replay the transcript, read the
    claimed evals, recompute the folded constraint value, and return
    (t, claims) where t is the transcript positioned at the multiopen
    phase and claims = [(key, commitment, point, value)]. Shared by
    verify_proof and the aggregation circuit's witness path."""
    cs = vk.cs
    dom = vk.domain
    n = vk.n
    usable = cs.usable_rows(n)
    curve = H.bn254_g1

    from .transcript import KeccakTranscript, PoseidonTranscript
    t = {"keccak": KeccakTranscript,
         "poseidon": PoseidonTranscript,
         "blake2b": Blake2bTranscript}[transcript](proof.data)
    for col_vals in instances:
        for v in col_vals:
            t.common_scalar(v)

    advice_comms = [t.read_point() for _ in cs.advice]
    theta = t.squeeze_challenge()
    lookup_perm_comms = []
    for _ in cs.lookups:
        ca = t.read_point()
        cst = t.read_point()
        lookup_perm_comms.append((ca, cst))
    beta = t.squeeze_challenge()
    gamma = t.squeeze_challenge()

    d = _cs_degree(cs)
    chunk_len = d - 2
    perm_cols = cs.permutation_columns
    chunks = [perm_cols[i:i + chunk_len]
              for i in range(0, len(perm_cols), chunk_len)]

    z_comms = [t.read_point() for _ in chunks]
    lookup_z_comms = [t.read_point() for _ in cs.lookups]
    rand_comm = t.read_point()
    y = t.squeeze_challenge()

    ext_k = vk.k + max(1, (d - 1).bit_length())
    f = (1 << ext_k) // n
    h_comms = [t.read_point() for _ in range(f)]

    x = t.squeeze_challenge()
    x_next = x * dom.omega % FR
    x_last = x * pow(dom.omega, usable, FR) % FR

    queries = column_queries(cs)
    kind_of = {col.index: col.kind for col in cs.columns}
    adv_idx = {col.index: i for i, col in enumerate(cs.advice)}
    fix_idx = {col.index: i for i, col in enumerate(cs.fixed)}
    inst_idx = {col.index: i for i, col in enumerate(cs.instance)}

    evals: Dict[Tuple[int, int], int] = {}
    claims: List[Tuple[object, int, int]] = []  # (commitment, point, value)

    for (gcol, rot) in queries:
        z = x * pow(dom.omega, rot % n, FR) % FR
        if kind_of[gcol] == "instance":
            vals = instances[inst_idx[gcol]]
            evals[(gcol, rot)] = instance_poly_eval(dom, vals, z)
            continue
        v = t.read_scalar()
        evals[(gcol, rot)] = v
        comm = (advice_comms[adv_idx[gcol]] if kind_of[gcol] == "advice"
                else vk.fixed_commitments[fix_idx[gcol]])
        claims.append((("col", gcol), comm, z, v))

    rand_eval = t.read_scalar()
    claims.append((("rand",), rand_comm, x, rand_eval))

    sigma_evals = []
    for gi in range(len(perm_cols)):
        v = t.read_scalar()
        sigma_evals.append(v)
        claims.append((("sig", gi), vk.sigma_commitments[gi], x, v))

    z_at_x, z_at_next = [], []
    for c_idx in range(len(chunks)):
        vx = t.read_scalar()
        vn = t.read_scalar()
        z_at_x.append(vx)
        z_at_next.append(vn)
        claims.append((("z", c_idx), z_comms[c_idx], x, vx))
        claims.append((("z", c_idx), z_comms[c_idx], x_next, vn))
    z_prev_last = []
    for c_idx in range(1, len(chunks)):
        v = t.read_scalar()
        z_prev_last.append(v)
        claims.append((("z", c_idx - 1), z_comms[c_idx - 1], x_last, v))

    x_prev = x * pow(dom.omega, n - 1, FR) % FR
    lookup_evals = []
    for li in range(len(cs.lookups)):
        zx = t.read_scalar()
        zn = t.read_scalar()
        apx = t.read_scalar()
        app = t.read_scalar()
        spx = t.read_scalar()
        lookup_evals.append((zx, zn, apx, app, spx))
        ca, cst = lookup_perm_comms[li]
        claims.append((("lz", li), lookup_z_comms[li], x, zx))
        claims.append((("lz", li), lookup_z_comms[li], x_next, zn))
        claims.append((("la", li), ca, x, apx))
        claims.append((("la", li), ca, x_prev, app))
        claims.append((("ls", li), cst, x, spx))

    # ---- recompute the folded constraint value at x ----
    l0x, llastx = lagrange_evals_at(dom, x, [0, usable])
    lblind_idx = list(range(usable + 1, n))
    lblindx = sum(lagrange_evals_at(dom, x, lblind_idx)) % FR if lblind_idx else 0
    lactive = (1 - llastx - lblindx) % FR

    vals = []
    for g in cs.gates:
        for p in g.polys:
            vals.append(eval_expr_at(p, evals))

    if chunks:
        vals.append(l0x * (1 - z_at_x[0]) % FR)
        vals.append(llastx * (z_at_x[-1] * z_at_x[-1] - z_at_x[-1]) % FR)
        for c in range(1, len(chunks)):
            vals.append(l0x * (z_at_x[c] - z_prev_last[c - 1]) % FR)
        for c_idx, chunk in enumerate(chunks):
            base = c_idx * chunk_len
            left = z_at_next[c_idx]
            right = z_at_x[c_idx]
            for off, col in enumerate(chunk):
                gi = base + off
                a = evals[(col, 0)]
                left = left * ((a + beta * sigma_evals[gi] + gamma) % FR) % FR
                right = right * ((a + beta * pow(DELTA, gi, FR) % FR * x
                                  + gamma) % FR) % FR
            vals.append((left - right) * lactive % FR)

    for li, lk in enumerate(cs.lookups):
        zx, zn, apx, app, spx = lookup_evals[li]
        a_c = 0
        for e in lk.inputs:
            a_c = (a_c * theta + eval_expr_at(e, evals)) % FR
        s_c = 0
        for e in lk.tables:
            s_c = (s_c * theta + eval_expr_at(e, evals)) % FR
        vals.append(l0x * (1 - zx) % FR)
        vals.append(llastx * (zx * zx - zx) % FR)
        vals.append(lactive * (
            zn * ((apx + beta) % FR) % FR * ((spx + gamma) % FR)
            - zx * ((a_c + beta) % FR) % FR * ((s_c + gamma) % FR)) % FR)
        vals.append(l0x * (apx - spx) % FR)
        vals.append(lactive * ((apx - spx) % FR) % FR
                    * ((apx - app) % FR) % FR)

    folded = 0
    for v in vals:
        folded = (folded * y + v) % FR
    zh_x = (pow(x, n, FR) - 1) % FR
    expected_h = folded * inv_mod(zh_x, FR) % FR

    # collapsed h commitment: sum x^{n i} [h_i]
    xn = pow(x, n, FR)
    h_comm = None
    mult = 1
    for cm in h_comms:
        h_comm = curve.add(h_comm, curve.mul(cm, mult))
        mult = mult * xn % FR
    claims.append((("H",), h_comm, x, expected_h))
    return t, claims


def _verify_proof(vk: VerifyingKey, srs: kzg.SrsKZG, proof: Proof,
                  instances: List[List[int]], trapdoor: bool,
                  scheme: str, transcript: str = "blake2b",
                  accumulator_indices=None) -> bool:
    t, claims = build_claims(vk, proof, instances, transcript)
    if scheme == "shplonk":
        extra = ()
        if accumulator_indices:
            extra = (accumulator_from_instances(instances,
                                                accumulator_indices),)
        return _check_shplonk(t, srs, claims, extra)
    return _check_gwc(t, srs, claims, trapdoor)


def _check_gwc(t, srs, claims, trapdoor: bool) -> bool:
    curve = H.bn254_g1
    v_ch = t.squeeze_challenge()
    by_point: Dict[int, List[Tuple[object, int]]] = {}
    for _key, comm, z, val in claims:
        by_point.setdefault(z, []).append((comm, val))
    open_claims = []
    for z in sorted(by_point):
        group = by_point[z]
        F = None
        rv = 0
        mult = 1
        for comm, val in group:
            F = curve.add(F, curve.mul(comm, mult))
            rv = (rv + mult * val) % FR
            mult = mult * v_ch % FR
        W = t.read_point()
        open_claims.append((F, z, rv, W))
    if trapdoor:
        return all(kzg.verify_open_trapdoor(srs, F, z, rv, W)
                   for (F, z, rv, W) in open_claims)
    return kzg.verify_open_batch(srs, open_claims)


def shplonk_accumulator(t, claims):
    r"""BDFG23 reduction: E = sum_S Z_{T\S}(u)(C_S - [r_S(u)]G) - Z_T(u)H
    must open to 0 at u with witness W. Returns the KZG accumulator pair
    (lhs, rhs) = (E + u·W, -W) satisfying
        e(lhs, [1]_2) · e(rhs, [tau]_2) == 1   iff the proof verifies.
    Shared by the final pairing check, the aggregation circuit's witness
    path, and the EVM codegen's structure."""
    from .prover import shplonk_partition, lagrange_interp, eval_host
    curve = H.bn254_g1
    gamma = t.squeeze_challenge()
    by_poly, sets, T = shplonk_partition(claims)
    group_data = []
    for S, keys in sets.items():
        C = None
        vals = {z: 0 for z in S}
        for key in keys:
            g = pow(gamma, by_poly[key]["idx"], FR)
            C = curve.add(C, curve.mul(by_poly[key]["obj"], g))
            for z in S:
                vals[z] = (vals[z] + g * by_poly[key]["pts"][z]) % FR
        group_data.append((S, C, lagrange_interp(list(S), vals)))
    Hc = t.read_point()
    u = t.squeeze_challenge()
    E = None
    const_acc = 0
    for (S, C, r_coeffs) in group_data:
        zts = 1
        for z in T:
            if z not in S:
                zts = zts * (u - z) % FR
        E = curve.add(E, curve.mul(C, zts))
        const_acc = (const_acc + zts * eval_host(r_coeffs, u)) % FR
    zt_u = 1
    for z in T:
        zt_u = zt_u * (u - z) % FR
    E = curve.add(E, curve.neg(curve.mul(curve.gen, const_acc)))
    E = curve.add(E, curve.neg(curve.mul(Hc, zt_u)))
    W = t.read_point()
    lhs = curve.add(E, curve.mul(W, u))
    return lhs, curve.neg(W)


def _check_shplonk(t, srs, claims, extra_accumulators=()) -> bool:
    from ..curves.pairing import bn254
    import secrets
    lhs, rhs = shplonk_accumulator(t, claims)
    curve = H.bn254_g1
    for (al, ar) in extra_accumulators:
        r = secrets.randbelow(FR - 1) + 1
        lhs = curve.add(lhs, curve.mul(al, r))
        rhs = curve.add(rhs, curve.mul(ar, r))
    return bn254().pairing_check([(lhs, srs.g2), (rhs, srs.s_g2)])
