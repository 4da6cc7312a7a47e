"""PLONK keygen: fixed commitments + permutation sigmas (halo2 semantics).

Mirrors halo2_proofs keygen_vk/keygen_pk as consumed by the reference's
AppCircuit::create_pk (util/circuit.rs:119-137). Cells are labeled
delta^i · omega^j (delta = g^2^S generates the non-2-adic part, so column
cosets are disjoint); copy cycles are built union-find style and each sigma
column evaluates to the label of the cycle-successor cell.

Device pipeline: sigma columns are materialized on device from the
(col, row) mapping arrays via two gathers + one multiply against
precomputed delta/omega power tables — no host big-int column loops — and
commitments use the one-call device Pippenger. The ProvingKey keeps only
the compact mapping (int32) plus host fixed lists; Montgomery tensors and
coefficient forms are built lazily per process and cached.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

from ..fields.params import BN254_FR as FR, BN254_FR_GENERATOR as GEN, BN254_FR_S as S
from ..fields import limb as L
from ..poly.domain import Domain
from ..poly import kzg
from .cs import ConstraintSystem

DELTA = pow(GEN, 1 << S, FR)


@dataclass
class VerifyingKey:
    k: int
    cs: ConstraintSystem
    fixed_commitments: List
    sigma_commitments: List
    domain: Domain

    @property
    def n(self):
        return 1 << self.k


@dataclass
class ProvingKey:
    vk: VerifyingKey
    fixed_evals: List[List[int]]       # per fixed column, n host ints
    # permutation mapping: (m, n, 2) int32 of (col_pos, row) successors
    mapping: np.ndarray
    _dev: dict = field(default_factory=dict, repr=False, compare=False)

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_dev"] = {}
        return d

    # ---- lazy device caches (per process) ----
    def _gidx_fixed(self, gidx: int) -> int:
        for i, col in enumerate(self.vk.cs.fixed):
            if col.index == gidx:
                return i
        raise KeyError(gidx)

    def dev_fixed(self, gidx: int):
        """Device Montgomery eval column for global fixed column `gidx`."""
        key = ("fixed", gidx)
        if key not in self._dev:
            from ..poly import fr_vec as V
            self._dev[key] = V.upload_ints(
                self.fixed_evals[self._gidx_fixed(gidx)], self.vk.n)
        return self._dev[key]

    def dev_sigma(self, gi: int):
        """Device Montgomery sigma eval column for permutation position gi."""
        key = ("sigma", gi)
        if key not in self._dev:
            self._dev[key] = _sigma_dev(
                self.vk.domain, self.mapping[gi], len(self.mapping))
        return self._dev[key]

    def dev_sigma_coeffs(self, gi: int):
        key = ("sigma_c", gi)
        if key not in self._dev:
            from ..poly import fr_vec as V
            self._dev[key] = V.intt_dev(self.dev_sigma(gi), self.vk.k)
        return self._dev[key]

    def drop_eval_forms(self):
        """Free device eval-form caches (fixed + sigma evals); the prover
        calls this once it only needs coefficient forms."""
        for key in [k for k in self._dev
                    if k[0] in ("fixed", "sigma")]:
            del self._dev[key]

    def drop_sigma_coeffs(self):
        """Free per-gi sigma coefficient caches (the prover folds them into
        its own stacked coefficient tensor)."""
        for key in [k for k in self._dev if k[0] == "sigma_c"]:
            del self._dev[key]

    def prefill_fixed(self):
        """Batch-upload all fixed columns in one transfer."""
        from ..poly import fr_vec as V
        cols = self.vk.cs.fixed
        if not cols or ("fixed", cols[-1].index) in self._dev:
            return
        up = V.unstack(V.upload_ints_many(self.fixed_evals, self.vk.n))
        for col, d in zip(cols, up):
            self._dev[("fixed", col.index)] = d

    def prefill_sigmas(self):
        """Batch-build all sigma eval + coefficient columns in a handful of
        device calls (the prover calls this once; per-gi getters then hit
        the cache)."""
        from ..poly import fr_vec as V
        m = len(self.mapping)
        if m == 0 or ("sigma_c", m - 1) in self._dev:
            return
        sigs = _sigma_dev_many(self.vk.domain, self.mapping, m)
        coeffs = V.intt_dev_many(sigs, self.vk.k)
        for gi, (s, c) in enumerate(zip(V.unstack(sigs),
                                        V.unstack(coeffs))):
            self._dev[("sigma", gi)] = s
            self._dev[("sigma_c", gi)] = c

    def sigma_coeffs_i16_host(self):
        """Host-cached int16 sigma coefficient stack (PROVE-INVARIANT):
        built once per process in device blocks and reused by every
        subsequent prove — warm k=18 proves skip all ~170 sigma INTTs,
        and the 2 GB stack stays out of HBM until the single staged
        upload of the full quotient stack."""
        cached = getattr(self, "_sigma_i16_host", None)
        if cached is not None:
            return cached
        import numpy as np
        import jax.numpy as jnp
        from ..poly import fr_vec as V
        m = len(self.mapping)
        n = self.vk.n
        # block by the whole-stack column budget, NOT the NTT batch rows:
        # a 64-wide ntt4 INTT at 2^17 holds ~6-10 (64, NL, n) temps inside
        # one program and OOM'd the step k=17 prove even with only 2.5 GiB
        # of arrays live (r5; the staging loop already chunks by
        # col_chunk for the same reason)
        block = max(1, min(V._NTT_BATCH_ROWS // n, V.col_chunk(n)))
        out = np.empty((m, V.NL, n), np.int16)
        for off in range(0, m, block):
            sigs = _sigma_dev_many(
                self.vk.domain, self.mapping[off:off + block], m)
            out[off:off + sigs.shape[0]] = np.asarray(
                V.intt_dev_many(sigs, self.vk.k).astype(jnp.int16))
            del sigs
        self._sigma_i16_host = out
        return out

    def sigma_coeffs_i16(self):
        """All sigma coefficient columns as ONE int16 (m, NL, n) stack,
        built in eval->INTT->int16 blocks that are freed as they land.

        The prefill_sigmas path materializes the full eval AND coeff
        stacks in int32 side by side (2 x 4.3 GB at testnet k=18, on top
        of the still-live advice/z columns) — that OOM'd the 512-key
        prove. Never caches per-gi forms; INTT outputs are canonical
        11-bit limbs so int16 is lossless (the quotient stack format)."""
        import jax.numpy as jnp
        from ..poly import fr_vec as V
        m = len(self.mapping)
        n = self.vk.n
        # same block cap as the host-staged variant (r5 step k=17 OOM)
        block = max(1, min(V._NTT_BATCH_ROWS // n, V.col_chunk(n)))
        parts = []
        for off in range(0, m, block):
            sigs = _sigma_dev_many(
                self.vk.domain, self.mapping[off:off + block], m)
            parts.append(V.sync_chunk(
                V.intt_dev_many(sigs, self.vk.k).astype(jnp.int16), n))
            del sigs
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def _sigma_dev(dom: Domain, map_i: np.ndarray, m: int):
    """sigma evals for one permutation column: delta^{ti} * omega^{tj}."""
    return _sigma_dev_many(dom, map_i[None], m)[0]


def _sigma_dev_many(dom: Domain, maps: np.ndarray, m: int):
    """(C, n, 2) successor mappings -> (C, NL, n) transposed sigma eval
    columns, column-chunked: one program over all 31 testnet permutation
    columns at k=18 compiled to 19.5 GB of mont_mul HLO temps."""
    import jax
    import jax.numpy as jnp
    from ..poly import fr_vec as V
    deltas = V.upload_ints([pow(DELTA, i, FR) for i in range(m)], m)
    omegas = V.powers(dom.omega, dom.n)

    @jax.jit
    def f(ti, tj, deltas, omegas):
        # deltas/omegas (NL, m)/(NL, n); ti/tj (C, n) -> (C, NL, n)
        dv = jnp.moveaxis(jnp.take(deltas, ti, axis=-1), -2, 0)
        ov = jnp.moveaxis(jnp.take(omegas, tj, axis=-1), -2, 0)
        return V.ops.mont_mul(dv, ov)

    C = maps.shape[0]
    step = V.col_chunk(dom.n)
    outs = []
    for off in range(0, C, step):
        blk = maps[off:off + step]
        outs.append(f(jnp.asarray(blk[..., 0]), jnp.asarray(blk[..., 1]),
                      deltas, omegas))
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def _build_permutation(cs: ConstraintSystem, n: int) -> np.ndarray:
    """Cycle structure over equality-enabled columns -> (m, n, 2) successor
    mapping (halo2 assembly semantics: splice by swapping successors)."""
    perm_cols = cs.permutation_columns
    col_pos = {c: i for i, c in enumerate(perm_cols)}
    m = len(perm_cols)
    mapping = np.empty((m, n, 2), np.int32)
    for i in range(m):
        mapping[i, :, 0] = i
        mapping[i, :, 1] = np.arange(n)
    # leaders with path compression over flattened cell ids
    aux = np.arange(m * n, dtype=np.int64)

    def leader(c: int) -> int:
        root = c
        while aux[root] != root:
            root = aux[root]
        while aux[c] != root:
            aux[c], c = root, aux[c]
        return root

    for (ca, ra), (cb, rb) in cs.copies:
        assert ca in col_pos and cb in col_pos, (
            "copy on column without enable_equality")
        a = col_pos[ca] * n + ra
        b = col_pos[cb] * n + rb
        la, lb = leader(a), leader(b)
        if la == lb:
            continue
        ai, aj = divmod(a, n)
        bi, bj = divmod(b, n)
        tmp = mapping[ai, aj].copy()
        mapping[ai, aj] = mapping[bi, bj]
        mapping[bi, bj] = tmp
        aux[la] = lb

    return mapping


def _ckpt_tag(k: int, ncols: int, mapping: np.ndarray) -> str:
    """Cheap integrity tag for a keygen checkpoint: k, column counts, and
    a hash of the permutation mapping (which encodes the whole copy
    structure — any layout drift changes it)."""
    import hashlib
    h = hashlib.sha256()
    h.update(b"%d:%d:%d:" % (k, ncols, len(mapping)))
    h.update(np.ascontiguousarray(mapping).tobytes())
    return h.hexdigest()[:16]


def keygen(cs: ConstraintSystem, k: int, fixed_evals: List[List[int]],
           srs: kzg.SrsKZG, checkpoint: str | None = None) -> ProvingKey:
    """fixed_evals: per fixed column, length-2^k int evaluations.

    checkpoint: optional path; column commitments are flushed there after
    every committed chunk so a killed keygen resumes instead of restarting
    (the reference caches only the finished PK, util/circuit.rs:119-137 —
    at ~1,300 column commits for step-nano a resumable partial matters).
    """
    from ..poly import fr_vec as V
    import os
    import pickle
    import time
    n = 1 << k
    dom = Domain(k)
    assert len(fixed_evals) == len(cs.fixed)
    fixed_evals = [list(e) + [0] * (n - len(e)) for e in fixed_evals]

    mapping = _build_permutation(cs, n)
    m = len(cs.permutation_columns)
    ncols = len(fixed_evals)
    total = ncols + m

    comms: List = []
    tag = None
    if checkpoint:
        tag = _ckpt_tag(k, ncols, mapping)
        if os.path.exists(checkpoint):
            try:
                with open(checkpoint, "rb") as f:
                    st = pickle.load(f)
                if st.get("tag") == tag:
                    comms = st["comms"]
                    print(f"[keygen] resume from checkpoint: "
                          f"{len(comms)}/{total} commits", flush=True)
                else:
                    print("[keygen] checkpoint tag mismatch — restarting",
                          flush=True)
            except Exception as e:  # corrupt checkpoint = restart
                print(f"[keygen] checkpoint unreadable ({e}) — restarting",
                      flush=True)

    def flush():
        if not checkpoint:
            return
        tmp = checkpoint + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump({"tag": tag, "comms": comms}, f)
        os.replace(tmp, checkpoint)

    # build + commit lazily: builds run in compile-safe col_chunk steps
    # (whole-stack upload/sigma programs OOMed the 16 GB chip at k=18:
    # mont REDC temps are ~1.3 KB/row/col in HLO); commits run at the
    # wider MSM batch width (same budget as commit_lagrange_col_list);
    # the checkpoint flushes after every committed group
    step = V.col_chunk(n)
    width = max(step, min(32, (1 << 31) // max(n * 192, 1)))
    t_last = time.time()
    while len(comms) < total:
        pending: List = []
        while len(pending) < width and len(comms) + len(pending) < total:
            off = len(comms) + len(pending)
            if off < ncols:
                cnt = min(step, ncols - off, width - len(pending))
                pending.extend(V.unstack(
                    V.upload_ints_many(fixed_evals[off:off + cnt], n)))
            else:
                soff = off - ncols
                cnt = min(step, m - soff, width - len(pending))
                pending.extend(V.unstack(
                    _sigma_dev_many(dom, mapping[soff:soff + cnt], m)))
        comms.extend(kzg.commit_lagrange_col_list(srs, pending))
        del pending
        flush()
        if checkpoint and time.time() - t_last > 30:
            print(f"[keygen] {len(comms)}/{total} commits", flush=True)
            t_last = time.time()

    if checkpoint and os.path.exists(checkpoint):
        os.remove(checkpoint)
    fixed_comms = comms[:ncols]
    sigma_comms = comms[ncols:]

    vk = VerifyingKey(k, cs, fixed_comms, sigma_comms, dom)
    return ProvingKey(vk, fixed_evals, mapping)
