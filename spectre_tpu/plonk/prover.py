"""PLONK prover (halo2 protocol shape: gates + chunked permutation +
vanishing + rotation multiopen).

v1 engine: exact host-int polynomial arithmetic orchestrated per the halo2
transcript order (advice commits → β,γ → permutation Z commits → random poly
→ y → quotient commits → x → evals → multiopen). Commits are KZG over the
test SRS. Device offload (NTT/MSM/grand-product kernels already exist in
poly/) replaces the host math behind the same step boundaries — the
transcript layout is the stable contract.

Lookups: not yet in the argument (landing with the range chip); the CS
accepts them and the MockProver checks them.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Dict, List, Tuple

from ..fields.params import BN254_FR as FR
from ..fields.host import inv_mod, batch_inv_mod
from ..poly.domain import Domain
from ..poly import kzg
from .cs import ConstraintSystem
from .keygen import ProvingKey, DELTA
from .transcript import Blake2bTranscript
from .protocol import column_queries, eval_expr_on_vectors
from .expression import ColumnRef


def _det_rand(seed: bytes, i: int) -> int:
    return int.from_bytes(
        hashlib.blake2b(seed + i.to_bytes(8, "little"),
                        digest_size=32).digest(), "little") % FR


def _cs_degree(cs: ConstraintSystem) -> int:
    # permutation constraint degree = chunk_len + 2; halo2 floors at 3.
    # lookup main rule: active * (Z(wX)(A'+b)(S'+g) - Z(X)(A+b)(S+g))
    #   degree = 1 + max(3, 1 + deg A + deg S)
    d = max(3, cs.max_gate_degree())
    for lk in cs.lookups:
        da = max(e.degree() for e in lk.inputs)
        ds = max(e.degree() for e in lk.tables)
        d = max(d, 1 + max(3, 1 + da + ds), 4)  # 4: (A'-S')(A'-A'_prev)*act
    return d


def _permute_lookup_pair(a_vals, s_vals, usable: int):
    """halo2 permute_expression_pair: sort A; build S' so each distinct A'
    value sits against an equal table value, repeats against leftovers."""
    a_sorted = sorted(v % FR for v in a_vals[:usable])
    from collections import Counter
    leftover = Counter(v % FR for v in s_vals[:usable])
    s_perm = [None] * usable
    repeats = []
    for i, v in enumerate(a_sorted):
        if i == 0 or v != a_sorted[i - 1]:
            if leftover[v] == 0:
                raise ValueError(f"lookup input {v} not in table")
            leftover[v] -= 1
            s_perm[i] = v
        else:
            repeats.append(i)
    rest = list(Counter({k: c for k, c in leftover.items() if c}).elements())
    assert len(rest) >= len(repeats)
    for i, pos in enumerate(repeats):
        s_perm[pos] = rest[i]
    return a_sorted, s_perm


def _coset_evals(dom: Domain, coeffs: List[int], ext_k: int, shift: int):
    """Evaluate poly (coeffs, len <= n_ext) on the coset shift * W_ext^i."""
    ext_dom = Domain(ext_k)
    n_ext = ext_dom.n
    c = list(coeffs) + [0] * (n_ext - len(coeffs))
    s = 1
    for i in range(len(coeffs)):
        c[i] = c[i] * s % FR
        s = s * shift % FR
    return ext_dom.ntt_host(c)


def _coset_interp(ext_dom: Domain, evals: List[int], shift: int) -> List[int]:
    """Inverse of _coset_evals: coset evals -> coefficients."""
    coeffs = ext_dom.intt_host(evals)
    sinv = inv_mod(shift, FR)
    s = 1
    for i in range(len(coeffs)):
        coeffs[i] = coeffs[i] * s % FR
        s = s * sinv % FR
    return coeffs


@dataclass
class Proof:
    data: bytes


def create_proof(pk: ProvingKey, srs: kzg.SrsKZG,
                 advice_evals: List[List[int]],
                 instances: List[List[int]],
                 seed: bytes = b"spectre-tpu") -> Proof:
    cs = pk.vk.cs
    dom = pk.vk.domain
    k, n = pk.vk.k, pk.vk.n
    usable = cs.usable_rows(n)
    blinders = n - usable  # blinding rows + the last usable boundary row

    t = Blake2bTranscript()
    for col_vals in instances:
        for v in col_vals:
            t.common_scalar(v)

    # --- instance eval vectors (full length) ---
    inst_evals = []
    for col_vals in instances:
        v = [x % FR for x in col_vals] + [0] * (n - len(col_vals))
        inst_evals.append(v)

    # --- 1. advice with blinding, commit ---
    advice_evals = [list(c) + [0] * (n - len(c)) for c in advice_evals]
    for ci, col in enumerate(advice_evals):
        for r in range(usable, n):
            col[r] = _det_rand(seed + b"adv", ci * n + r)
    advice_comms = []
    for col in advice_evals:
        cm = kzg.commit_lagrange_auto(srs, col)
        advice_comms.append(cm)
        t.write_point(cm)

    # column value lookup by global index
    col_evals: Dict[int, List[int]] = {}
    fi = ai = ii = 0
    for col in cs.columns:
        if col.kind == "fixed":
            col_evals[col.index] = pk.fixed_evals[fi]
            fi += 1
        elif col.kind == "advice":
            col_evals[col.index] = advice_evals[ai]
            ai += 1
        else:
            col_evals[col.index] = inst_evals[ii]
            ii += 1

    # --- 1b. lookups: compress with theta, commit permuted pairs ---
    theta = t.squeeze_challenge()

    def eval_on_rows(expr) -> List[int]:
        from .protocol import eval_expr_on_vectors
        return eval_expr_on_vectors(expr, col_evals, 1, n)

    lookups_data = []
    for lk in cs.lookups:
        a_c = [0] * n
        for e in lk.inputs:
            ev = eval_on_rows(e)
            a_c = [(x * theta + v) % FR for x, v in zip(a_c, ev)]
        s_c = [0] * n
        for e in lk.tables:
            ev = eval_on_rows(e)
            s_c = [(x * theta + v) % FR for x, v in zip(s_c, ev)]
        a_perm, s_perm = _permute_lookup_pair(a_c, s_c, usable)
        li = len(lookups_data)
        a_perm = a_perm + [_det_rand(seed + b"la", li * n + r)
                           for r in range(usable, n)]
        s_perm = s_perm + [_det_rand(seed + b"ls", li * n + r)
                           for r in range(usable, n)]
        ca = kzg.commit_lagrange_auto(srs, a_perm)
        cs_ = kzg.commit_lagrange_auto(srs, s_perm)
        t.write_point(ca)
        t.write_point(cs_)
        lookups_data.append(dict(a_c=a_c, s_c=s_c, a_perm=a_perm,
                                 s_perm=s_perm, ca=ca, cs=cs_))

    beta = t.squeeze_challenge()
    gamma = t.squeeze_challenge()

    # --- 2. permutation grand products (chunked) ---
    d = _cs_degree(cs)
    chunk_len = d - 2
    perm_cols = cs.permutation_columns
    chunks = [perm_cols[i:i + chunk_len]
              for i in range(0, len(perm_cols), chunk_len)]
    omegas = [1] * n
    for j in range(1, n):
        omegas[j] = omegas[j - 1] * dom.omega % FR

    z_evals_all = []
    last_z = 1  # chunks chain: Z_c(w^0) = Z_{c-1}(w^usable) (halo2 last_z)
    for c_idx, chunk in enumerate(chunks):
        base = c_idx * chunk_len
        num = [1] * n
        den = [1] * n
        for off, col in enumerate(chunk):
            gi = base + off
            vals = col_evals[col]
            sig = pk.sigma_evals[gi]
            dlt = pow(DELTA, gi, FR)
            for r in range(n):
                num[r] = num[r] * ((vals[r] + beta * dlt % FR * omegas[r]
                                    + gamma) % FR) % FR
                den[r] = den[r] * ((vals[r] + beta * sig[r] + gamma) % FR) % FR
        den_inv = batch_inv_mod(den, FR)
        acc = last_z
        zv = [0] * n
        zv[0] = last_z
        for r in range(usable):
            acc = acc * num[r] % FR * den_inv[r] % FR
            if r + 1 < n:
                zv[r + 1] = acc
        last_z = acc
        for r in range(usable + 1, n):
            zv[r] = _det_rand(seed + b"z", c_idx * n + r)
        z_evals_all.append(zv)

    z_comms = []
    for zv in z_evals_all:
        cm = kzg.commit_lagrange_auto(srs, zv)
        z_comms.append(cm)
        t.write_point(cm)

    # --- 2b. lookup grand products ---
    for li, ld in enumerate(lookups_data):
        num = [(ld["a_c"][r] + beta) % FR * ((ld["s_c"][r] + gamma) % FR) % FR
               for r in range(n)]
        den = [(ld["a_perm"][r] + beta) % FR
               * ((ld["s_perm"][r] + gamma) % FR) % FR for r in range(n)]
        den_inv = batch_inv_mod(den, FR)
        zv = [0] * n
        zv[0] = 1
        acc = 1
        for r in range(usable):
            acc = acc * num[r] % FR * den_inv[r] % FR
            if r + 1 < n:
                zv[r + 1] = acc
        for r in range(usable + 1, n):
            zv[r] = _det_rand(seed + b"lz", li * n + r)
        cm = kzg.commit_lagrange_auto(srs, zv)
        t.write_point(cm)
        ld["z"] = zv
        ld["cz"] = cm

    # --- 3. vanishing random poly ---
    rand_coeffs = [_det_rand(seed + b"rnd", i) for i in range(n)]
    rand_comm = kzg.commit_coeff_auto(srs, rand_coeffs)
    t.write_point(rand_comm)

    y = t.squeeze_challenge()

    # --- 4. quotient on extended coset ---
    ext_k = k + max(1, (d - 1).bit_length())
    ext_dom = Domain(ext_k)
    n_ext = ext_dom.n
    f = n_ext // n  # extension factor = rotation unit
    shift = 5  # coset shift: any non-subgroup element; 5 is not a 2^S root

    coeffs_cache: Dict[int, List[int]] = {}
    coset_cache: Dict[int, List[int]] = {}
    for gidx, evals in col_evals.items():
        coeffs_cache[gidx] = dom.intt_host(evals)
        coset_cache[gidx] = _coset_evals(dom, coeffs_cache[gidx], ext_k, shift)

    # lagrange indicator polys on the coset
    def indicator_coset(rows: List[int]) -> List[int]:
        e = [0] * n
        for r in rows:
            e[r] = 1
        return _coset_evals(dom, dom.intt_host(e), ext_k, shift)

    l0 = indicator_coset([0])
    llast = indicator_coset([usable])
    lblind = indicator_coset(list(range(usable + 1, n)))
    lactive = [(1 - a - b) % FR for a, b in zip(llast, lblind)]

    # identity X on the coset: shift * w_ext^i
    xs = [0] * n_ext
    cur = shift % FR
    for i in range(n_ext):
        xs[i] = cur
        cur = cur * ext_dom.omega % FR

    constraints: List[List[int]] = []
    for g in cs.gates:
        for p in g.polys:
            constraints.append(
                eval_expr_on_vectors(p, coset_cache, f, n_ext))

    # permutation constraints on coset
    z_coset = []
    z_coeffs = []
    for zv in z_evals_all:
        zc = dom.intt_host(zv)
        z_coeffs.append(zc)
        z_coset.append(_coset_evals(dom, zc, ext_k, shift))

    if chunks:
        # l_0 * (1 - Z_0)
        constraints.append([l0[i] * (1 - z_coset[0][i]) % FR
                            for i in range(n_ext)])
        # l_last * (Z_last^2 - Z_last)
        zl = z_coset[-1]
        constraints.append([llast[i] * (zl[i] * zl[i] - zl[i]) % FR
                            for i in range(n_ext)])
        # chunk joins: l_0 * (Z_c - Z_{c-1}(w^u X))
        ushift = (usable * f) % n_ext
        for c in range(1, len(chunks)):
            prev = z_coset[c - 1]
            prev_rot = prev[ushift:] + prev[:ushift]
            constraints.append([l0[i] * (z_coset[c][i] - prev_rot[i]) % FR
                                for i in range(n_ext)])
        # main rule per chunk
        for c_idx, chunk in enumerate(chunks):
            base = c_idx * chunk_len
            zc = z_coset[c_idx]
            zc_next = zc[f:] + zc[:f]
            left = list(zc_next)
            right = list(zc)
            for off, col in enumerate(chunk):
                gi = base + off
                vals = coset_cache[col]
                sig = _coset_evals(dom, pk.sigma_coeffs[gi], ext_k, shift)
                dlt = pow(DELTA, gi, FR)
                for i in range(n_ext):
                    left[i] = left[i] * ((vals[i] + beta * sig[i] + gamma)
                                         % FR) % FR
                    right[i] = right[i] * ((vals[i] + beta * dlt % FR * xs[i]
                                            + gamma) % FR) % FR
            constraints.append([(left[i] - right[i]) * lactive[i] % FR
                                for i in range(n_ext)])

    # lookup constraints on coset
    from .expression import Const as _Const
    for lk, ld in zip(cs.lookups, lookups_data):
        def compress_coset(exprs):
            acc = None
            for e in exprs:
                ev = eval_expr_on_vectors(e, coset_cache, f, n_ext)
                if acc is None:
                    acc = ev
                else:
                    acc = [(a * theta + v) % FR for a, v in zip(acc, ev)]
            return acc

        a_cos = compress_coset(lk.inputs)
        s_cos = compress_coset(lk.tables)
        ap_cos = _coset_evals(dom, dom.intt_host(ld["a_perm"]), ext_k, shift)
        sp_cos = _coset_evals(dom, dom.intt_host(ld["s_perm"]), ext_k, shift)
        z_cos = _coset_evals(dom, dom.intt_host(ld["z"]), ext_k, shift)
        z_next = z_cos[f:] + z_cos[:f]
        ap_prev = ap_cos[-f:] + ap_cos[:-f]
        constraints.append([l0[i] * (1 - z_cos[i]) % FR for i in range(n_ext)])
        constraints.append([llast[i] * (z_cos[i] * z_cos[i] - z_cos[i]) % FR
                            for i in range(n_ext)])
        constraints.append([
            lactive[i] * (
                z_next[i] * ((ap_cos[i] + beta) % FR) % FR
                * ((sp_cos[i] + gamma) % FR)
                - z_cos[i] * ((a_cos[i] + beta) % FR) % FR
                * ((s_cos[i] + gamma) % FR)
            ) % FR for i in range(n_ext)])
        constraints.append([l0[i] * (ap_cos[i] - sp_cos[i]) % FR
                            for i in range(n_ext)])
        constraints.append([
            lactive[i] * ((ap_cos[i] - sp_cos[i]) % FR)
            * ((ap_cos[i] - ap_prev[i]) % FR) % FR for i in range(n_ext)])
        ld["ap_coeffs"] = dom.intt_host(ld["a_perm"])
        ld["sp_coeffs"] = dom.intt_host(ld["s_perm"])
        ld["z_coeffs"] = dom.intt_host(ld["z"])

    # fold with y and divide by Z_H
    acc = [0] * n_ext
    for cvec in constraints:
        acc = [(a * y + c) % FR for a, c in zip(acc, cvec)]
    # Z_H(shift*w^i) = shift^n * w^{ni} - 1, period f in i
    sn = pow(shift, n, FR)
    wn = pow(ext_dom.omega, n, FR)
    zh = []
    curw = 1
    for i in range(f):
        zh.append((sn * curw - 1) % FR)
        curw = curw * wn % FR
    zh_inv = batch_inv_mod(zh, FR)
    h_evals = [acc[i] * zh_inv[i % f] % FR for i in range(n_ext)]
    h_coeffs = _coset_interp(ext_dom, h_evals, shift)
    # split into f pieces of degree < n
    h_pieces = [h_coeffs[i * n:(i + 1) * n] for i in range(f)]
    h_comms = []
    for piece in h_pieces:
        cm = kzg.commit_coeff_auto(srs, piece)
        h_comms.append(cm)
        t.write_point(cm)

    x = t.squeeze_challenge()

    # --- 5. evaluations ---
    queries = column_queries(cs)

    def eval_at(coeffs: List[int], z: int) -> int:
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * z + c) % FR
        return acc

    x_next = x * dom.omega % FR
    x_last = x * pow(dom.omega, usable, FR) % FR

    # committed-column evals (advice + fixed); instance evals are recomputed
    # by the verifier
    eval_claims: List[Tuple[List[int], int, int, object]] = []  # (coeffs, point, value, comm)

    kind_of = {col.index: col.kind for col in cs.columns}
    adv_idx = {col.index: i for i, col in enumerate(cs.advice)}
    fix_idx = {col.index: i for i, col in enumerate(cs.fixed)}

    for (gcol, rot) in queries:
        if kind_of[gcol] == "instance":
            continue
        z = x * pow(dom.omega, rot % n, FR) % FR
        coeffs = coeffs_cache[gcol]
        v = eval_at(coeffs, z)
        t.write_scalar(v)
        comm = (advice_comms[adv_idx[gcol]] if kind_of[gcol] == "advice"
                else pk.vk.fixed_commitments[fix_idx[gcol]])
        eval_claims.append((coeffs, z, v, comm))

    # random poly at x
    rv = eval_at(rand_coeffs, x)
    t.write_scalar(rv)
    eval_claims.append((rand_coeffs, x, rv, rand_comm))

    # sigmas at x
    for gi in range(len(perm_cols)):
        v = eval_at(pk.sigma_coeffs[gi], x)
        t.write_scalar(v)
        eval_claims.append((pk.sigma_coeffs[gi], x, v, pk.vk.sigma_commitments[gi]))

    # Z chunks at x, x_next; previous chunk at x_last
    for c_idx in range(len(chunks)):
        zc = z_coeffs[c_idx]
        for z_pt in (x, x_next):
            v = eval_at(zc, z_pt)
            t.write_scalar(v)
            eval_claims.append((zc, z_pt, v, z_comms[c_idx]))
    for c_idx in range(1, len(chunks)):
        zc = z_coeffs[c_idx - 1]
        v = eval_at(zc, x_last)
        t.write_scalar(v)
        eval_claims.append((zc, x_last, v, z_comms[c_idx - 1]))

    # lookup evals: Z(x), Z(wx), A'(x), A'(w^-1 x), S'(x)
    x_prev = x * pow(dom.omega, n - 1, FR) % FR
    for ld in lookups_data:
        for coeffs, z_pt, comm in (
                (ld["z_coeffs"], x, ld["cz"]),
                (ld["z_coeffs"], x_next, ld["cz"]),
                (ld["ap_coeffs"], x, ld["ca"]),
                (ld["ap_coeffs"], x_prev, ld["ca"]),
                (ld["sp_coeffs"], x, ld["cs"])):
            v = eval_at(coeffs, z_pt)
            t.write_scalar(v)
            eval_claims.append((coeffs, z_pt, v, comm))

    # h collapsed: single poly sum x^{n i} h_i — open at x
    h_collapsed = [0] * n
    xn = pow(x, n, FR)
    mult = 1
    for piece in h_pieces:
        for j, c in enumerate(piece):
            h_collapsed[j] = (h_collapsed[j] + mult * c) % FR
        mult = mult * xn % FR
    hv = eval_at(h_collapsed, x)
    # h eval is NOT written (verifier derives the expected value)
    h_comm_collapsed = None  # verifier folds commitments itself
    eval_claims.append((h_collapsed, x, hv, "H"))

    # --- 6. GWC multiopen: fold per point with v, one witness per point ---
    v_ch = t.squeeze_challenge()
    by_point: Dict[int, List[Tuple[List[int], int]]] = {}
    for coeffs, z, val, _ in eval_claims:
        by_point.setdefault(z, []).append((coeffs, val))
    for z in sorted(by_point):
        group = by_point[z]
        F = [0] * max(len(c) for c, _ in group)
        rv_f = 0
        mult = 1
        for coeffs, val in group:
            for j, c in enumerate(coeffs):
                F[j] = (F[j] + mult * c) % FR
            rv_f = (rv_f + mult * val) % FR
            mult = mult * v_ch % FR
        _, W = kzg.open_at_host(srs, F, z)
        t.write_point(W)

    return Proof(t.proof())
