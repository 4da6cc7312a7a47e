"""KZG commitment scheme over BN254 (the reference's ParamsKZG analog).

SRS here is generated from a deterministic test tau (the reference loads
perpetual-powers-of-tau files via PARAMS_DIR — halo2-base gen_srs,
SURVEY.md §5 checkpoint/resume; those files aren't redistributable from this
snapshot, so production deployments point srs_from_file at the same .srs
format later). Commitments are device MSMs over the Lagrange-basis SRS;
openings divide by (X - z) with an associative suffix scan.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..fields.params import BN254_FR as FR
from ..fields.host import inv_mod
from ..fields import limb as L
from ..curves import host as H
from ..curves.limbjax import bn254_g1_ops as G1OPS
from .domain import Domain
from . import msm as M


@dataclass
class SrsKZG:
    """2^k KZG params: coeff- and Lagrange-basis G1 powers (+ test trapdoor)."""

    k: int
    g1_coeff: list          # [tau^i]G1 affine host points
    g1_lagrange: list       # [L_i(tau)]G1 affine host points
    g2: tuple               # generator of G2 (host affine)
    s_g2: tuple             # [tau]G2
    tau: int | None = None  # test trapdoor (None for external SRS)

    @functools.cached_property
    def g1_lagrange_enc(self):
        return G1OPS.encode_points(self.g1_lagrange)

    @functools.cached_property
    def g1_coeff_enc(self):
        return G1OPS.encode_points(self.g1_coeff)


@functools.lru_cache(maxsize=None)
def test_srs(k: int, seed: int = 42) -> SrsKZG:
    """Deterministic test SRS with known trapdoor."""
    import hashlib
    tau = int.from_bytes(hashlib.sha256(b"spectre-tpu-srs-%d" % seed).digest(),
                         "little") % FR
    n = 1 << k
    dom = Domain(k)
    curve = H.bn254_g1
    # coeff basis: tau^i G
    powers = [1] * n
    for i in range(1, n):
        powers[i] = powers[i - 1] * tau % FR
    if n >= 8192:
        from .msm import batch_fixed_base_mul
        g1_coeff = batch_fixed_base_mul(powers, "bn254_g1")
    else:
        g1_coeff = [curve.mul(curve.gen, p) for p in powers]
    # lagrange basis: L_i(tau) G ; L_i(tau) = (tau^n - 1)/(n (tau - w^i)) * w^i
    zn = (pow(tau, n, FR) - 1) % FR
    n_inv = inv_mod(n, FR)
    w = dom.omega
    wi = 1
    lag = []
    from ..fields.host import batch_inv_mod
    denoms = []
    ws = []
    for i in range(n):
        denoms.append((tau - wi) % FR)
        ws.append(wi)
        wi = wi * w % FR
    dinv = batch_inv_mod(denoms, FR)
    for i in range(n):
        li = zn * n_inv % FR * ws[i] % FR * dinv[i] % FR
        lag.append(li)
    if n >= 8192:
        from .msm import batch_fixed_base_mul
        g1_lagrange = batch_fixed_base_mul(lag, "bn254_g1")
    else:
        g1_lagrange = [curve.mul(curve.gen, l) for l in lag]
    # BN254 G2 generator (standard) and [tau]G2
    g2 = (
        (10857046999023057135944570762232829481370756359578518086990519993285655852781,
         11559732032986387107991004021392285783925812861821192530917403151452391805634),
        (8495653923123431417604973247489272438418190587263600148770280649306958101930,
         4082367875863433681332203403145435568316851327593401208105741076214120093531),
    )
    from .g2_host import bn254_g2_mul
    s_g2 = bn254_g2_mul(g2, tau)
    return SrsKZG(k, g1_coeff, g1_lagrange, g2, s_g2, tau)


def save_srs(srs: SrsKZG, path: str):
    """Serialize SRS to an .npz (coordinates as 48-byte LE blobs)."""
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def pack(pts):
        arr = np.zeros((len(pts), 65), np.uint8)
        for i, p in enumerate(pts):
            if p is None:
                continue
            arr[i, 0] = 1
            arr[i, 1:33] = np.frombuffer(
                int(p[0]).to_bytes(32, "little"), np.uint8)
            arr[i, 33:65] = np.frombuffer(
                int(p[1]).to_bytes(32, "little"), np.uint8)
        return arr

    g2b = np.frombuffer(
        b"".join(int(c).to_bytes(32, "little")
                 for pair in (srs.g2, srs.s_g2) for c in (*pair[0], *pair[1])),
        np.uint8)
    np.savez_compressed(
        path, k=srs.k, coeff=pack(srs.g1_coeff), lag=pack(srs.g1_lagrange),
        g2=g2b, tau=np.frombuffer(
            int(srs.tau or 0).to_bytes(32, "little"), np.uint8))


def load_srs(path: str) -> SrsKZG:
    d = np.load(path)

    def unpack(arr):
        out = []
        for row in arr:
            if row[0] == 0:
                out.append(None)
            else:
                out.append((int.from_bytes(row[1:33].tobytes(), "little"),
                            int.from_bytes(row[33:65].tobytes(), "little")))
        return out

    g2b = d["g2"].tobytes()
    vals = [int.from_bytes(g2b[i * 32:(i + 1) * 32], "little")
            for i in range(8)]
    g2 = ((vals[0], vals[1]), (vals[2], vals[3]))
    s_g2 = ((vals[4], vals[5]), (vals[6], vals[7]))
    tau = int.from_bytes(d["tau"].tobytes(), "little") or None
    return SrsKZG(int(d["k"]), unpack(d["coeff"]), unpack(d["lag"]),
                  g2, s_g2, tau)


_SRS_FILE_CACHE: dict = {}


def write_params_halo2(srs: SrsKZG, path: str):
    """Serialize to halo2's ParamsKZG<Bn256> binary layout
    (SerdeFormat::RawBytes — what halo2-base's gen_srs/read_params and the
    perpetual-powers-of-tau ecosystem `.srs` files use):
    k as u32 LE, then n G1 points of the coeff basis, n of the Lagrange
    basis, then g2 and s_g2 — every coordinate 32 canonical LE bytes."""
    import os
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def g1b(p):
        if p is None:
            return b"\x00" * 64
        return (int(p[0]).to_bytes(32, "little")
                + int(p[1]).to_bytes(32, "little"))

    def g2b(p):
        (x0, x1), (y0, y1) = p
        return b"".join(int(c).to_bytes(32, "little")
                        for c in (x0, x1, y0, y1))

    with open(path, "wb") as f:
        f.write(int(srs.k).to_bytes(4, "little"))
        for p in srs.g1_coeff:
            f.write(g1b(p))
        for p in srs.g1_lagrange:
            f.write(g1b(p))
        f.write(g2b(srs.g2))
        f.write(g2b(srs.s_g2))


def read_params_halo2(path: str, check: bool = True) -> SrsKZG:
    """Read a halo2 ParamsKZG<Bn256> `.srs` file (see write_params_halo2).
    check=True validates points are on-curve and the tau consistency
    pairing e(tau*G1, G2) == e(G1, tau*G2)."""
    from ..fields.params import BN254_FQ as FQ
    with open(path, "rb") as f:
        data = f.read()
    k = int.from_bytes(data[:4], "little")
    n = 1 << k
    need = 4 + 64 * 2 * n + 128 * 2
    assert len(data) >= need, f"srs file truncated: {len(data)} < {need}"

    def g1_at(off):
        x = int.from_bytes(data[off:off + 32], "little")
        y = int.from_bytes(data[off + 32:off + 64], "little")
        if x == 0 and y == 0:
            return None
        if check:
            assert x < FQ and y < FQ, "coordinate out of range"
            assert (y * y - (x * x * x + 3)) % FQ == 0, "not on curve"
        return (x, y)

    def g2_at(off):
        c = [int.from_bytes(data[off + 32 * i:off + 32 * (i + 1)], "little")
             for i in range(4)]
        return ((c[0], c[1]), (c[2], c[3]))

    g1_coeff = [g1_at(4 + 64 * i) for i in range(n)]
    base = 4 + 64 * n
    g1_lagrange = [g1_at(base + 64 * i) for i in range(n)]
    base += 64 * n
    g2 = g2_at(base)
    s_g2 = g2_at(base + 128)
    srs = SrsKZG(k=k, g1_coeff=g1_coeff, g1_lagrange=g1_lagrange,
                 g2=g2, s_g2=s_g2, tau=None)
    if check and n >= 2:
        from ..curves.pairing import bn254
        e = bn254()
        # e(tau*G1, G2) == e(G1, tau*G2)  <=>  product check with negation
        neg = H.bn254_g1.neg(srs.g1_coeff[1])
        assert e.pairing_check([(neg, g2), (srs.g1_coeff[0], s_g2)]), \
            "SRS tau consistency pairing failed"
    return srs


def cached_srs(k: int, params_dir: str | None = None) -> SrsKZG:
    """Load (or generate + persist) the test SRS for degree k.

    The PARAMS_DIR analog of halo2-base gen_srs (SURVEY §5
    checkpoint/resume): deterministic test SRS, cached on disk so big-k
    setup cost is paid once per machine."""
    import os
    params_dir = params_dir or os.environ.get("PARAMS_DIR", "./build/params")
    key = (k, params_dir)
    if key in _SRS_FILE_CACHE:
        return _SRS_FILE_CACHE[key]
    # an externally-provided halo2-format SRS takes precedence (the
    # halo2-base naming gen_srs uses: kzg_bn254_{k}.srs in PARAMS_DIR)
    halo2_path = os.path.join(params_dir, f"kzg_bn254_{k}.srs")
    if os.path.exists(halo2_path):
        srs = read_params_halo2(halo2_path)
    else:
        path = os.path.join(params_dir, f"srs_{k}.npz")
        if os.path.exists(path):
            srs = load_srs(path)
        else:
            srs = test_srs(k)
            save_srs(srs, path)
    _SRS_FILE_CACHE[key] = srs
    return srs


def commit_lagrange(srs: SrsKZG, evals_plain_limbs):
    """Commit to a polynomial given by its evaluations on the domain.

    evals_plain_limbs: (n, fr_limbs) canonical *plain* (non-Montgomery) limb
    array of Fr values — MSM scalars. Returns a host affine point.
    """
    import jax.numpy as jnp
    P = srs.g1_lagrange_enc
    acc = M._msm_jit("bn254_g1", 254)(P, jnp.asarray(evals_plain_limbs))
    return G1OPS.decode_points(tuple(np.asarray(c)[None] for c in acc))[0]


def commit_lagrange_host(srs: SrsKZG, evals: list):
    """Host-oracle commit (python ints)."""
    return H.bn254_g1.msm(srs.g1_lagrange, evals)


# device-MSM threshold: below this the host double-and-add is faster than a
# tunnel roundtrip + kernel dispatch
DEVICE_MSM_MIN = 2048


def _lag_enc_dev(srs: SrsKZG):
    import jax.numpy as jnp
    if not hasattr(srs, "_lag_enc"):
        X, Y, Z = srs.g1_lagrange_enc
        srs._lag_enc = (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))
    return srs._lag_enc


def _coeff_enc_dev(srs: SrsKZG):
    import jax.numpy as jnp
    if not hasattr(srs, "_coeff_enc"):
        X, Y, Z = srs.g1_coeff_enc
        srs._coeff_enc = (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z))
    return srs._coeff_enc


def commit_lagrange_auto(srs: SrsKZG, evals: list):
    """Commit via device Pippenger for large columns, host MSM otherwise."""
    n = len(evals)
    if n < DEVICE_MSM_MIN:
        return commit_lagrange_host(srs, evals)
    from .msm_pippenger import commit_dev
    enc = tuple(c[:n] for c in _lag_enc_dev(srs))
    scalars = L.fr_spec.encode_plain_batch(evals)
    return commit_dev(enc, scalars)


def commit_coeff_auto(srs: SrsKZG, coeffs: list):
    n = len(coeffs)
    if n < DEVICE_MSM_MIN:
        return commit_coeff_host(srs, coeffs)
    from .msm_pippenger import commit_dev
    enc = tuple(c[:n] for c in _coeff_enc_dev(srs))
    scalars = L.fr_spec.encode_plain_batch(coeffs)
    return commit_dev(enc, scalars)


def _lag_enc_dev_t(srs: SrsKZG, n: int):
    """Transposed (NL, n) device encodings of the Lagrange basis (zero lane
    padding — 96 B/point/coord instead of the AoS layout's 512 B)."""
    import jax.numpy as jnp
    key = "_lag_enc_t_%d" % n
    if not hasattr(srs, key):
        X, Y, Z = srs.g1_lagrange_enc
        setattr(srs, key, tuple(
            jnp.asarray(np.ascontiguousarray(c[:n].T)) for c in (X, Y, Z)))
    return getattr(srs, key)


def _coeff_enc_dev_t(srs: SrsKZG, n: int):
    import jax.numpy as jnp
    key = "_coeff_enc_t_%d" % n
    if not hasattr(srs, key):
        X, Y, Z = srs.g1_coeff_enc
        setattr(srs, key, tuple(
            jnp.asarray(np.ascontiguousarray(c[:n].T)) for c in (X, Y, Z)))
    return getattr(srs, key)


def _download_cols_t(cols_mont_t):
    """(…, NL, n) device Montgomery -> canonical int rows (host)."""
    from ..fields.limb_t import make_ops_t
    from ..fields import limb as LL
    plain = np.asarray(make_ops_t("bn254_fr").from_mont(cols_mont_t))
    return LL.fr_spec.decode_plain_batch(np.swapaxes(plain, -1, -2))


def commit_lagrange_col(srs: SrsKZG, col_mont_t):
    """Commit a device-resident TRANSPOSED (NL, n) Montgomery eval column
    (routes through the batched kernel at C=1 so single commits share the
    vmapped program family instead of tracing a separate scalar program —
    tunnel traces/compile-cache loads cost tens of seconds each)."""
    return commit_lagrange_cols(srs, col_mont_t[None])[0]


def _from_mont_chunked(cols_mont_t):
    """Column-chunked Montgomery->plain conversion: one whole-stack
    from_mont over 50+ columns at k=18 compiles to multi-GB HLO temps
    (the 512-key keygen OOM)."""
    import jax.numpy as jnp
    from ..fields.limb_t import make_ops_t
    from .fr_vec import col_chunk
    ops = make_ops_t("bn254_fr")
    C, n = cols_mont_t.shape[0], cols_mont_t.shape[-1]
    step = col_chunk(n)
    if C <= step:
        return ops.from_mont(cols_mont_t)
    outs = [ops.from_mont(cols_mont_t[i:i + step])
            for i in range(0, C, step)]
    return jnp.concatenate(outs)


def commit_lagrange_col_list(srs: SrsKZG, cols):
    """Commit a LIST of (NL, n) device columns in col_chunk-sized groups —
    never materializes the whole (C, NL, n) stack. At k=18 the 141-column
    advice stack is 3.5 GB and its plain-form copy another 3.5 GB on top of
    the live per-column buffers; the whole-stack version OOMed the chip."""
    if not cols:
        return []
    import jax.numpy as jnp
    from .fr_vec import col_chunk
    n = cols[0].shape[-1]
    # the commit path's own compile-temp hazards (from_mont REDC) are
    # sub-chunked inside commit_lagrange_cols; the outer width is bounded
    # only by BUFFER size (mont stack + plain copy ~192 B/row/col), so it
    # can be much wider than col_chunk — fewer, better-batched MSM calls
    step = max(col_chunk(n), min(32, (1 << 31) // max(n * 192, 1)))
    out = []
    for off in range(0, len(cols), step):
        out.extend(commit_lagrange_cols(
            srs, jnp.stack(cols[off:off + step])))
    return out


def commit_lagrange_cols(srs: SrsKZG, cols_mont_t):
    """Batched commit of C transposed Montgomery eval columns (C, NL, n) ->
    list of C points. At most a handful of device calls total."""
    C, n = cols_mont_t.shape[0], cols_mont_t.shape[-1]
    if n < DEVICE_MSM_MIN:
        vals = _download_cols_t(cols_mont_t)
        return [commit_lagrange_host(srs, vals[i * n:(i + 1) * n])
                for i in range(C)]
    from .msm_pippenger import commit_dev_many_t
    enc = tuple(c[:, :n] for c in _lag_enc_dev_t(srs, n))
    return commit_dev_many_t(enc, _from_mont_chunked(cols_mont_t))


def commit_coeff_cols(srs: SrsKZG, cols_mont_t):
    """Batched commit of C transposed Montgomery coefficient columns."""
    C, n = cols_mont_t.shape[0], cols_mont_t.shape[-1]
    if n < DEVICE_MSM_MIN:
        vals = _download_cols_t(cols_mont_t)
        return [commit_coeff_host(srs, vals[i * n:(i + 1) * n])
                for i in range(C)]
    from .msm_pippenger import commit_dev_many_t
    enc = tuple(c[:, :n] for c in _coeff_enc_dev_t(srs, n))
    return commit_dev_many_t(enc, _from_mont_chunked(cols_mont_t))


def commit_coeff_col(srs: SrsKZG, coeffs_mont_t):
    return commit_coeff_cols(srs, coeffs_mont_t[None])[0]


def commit_coeff_host(srs: SrsKZG, coeffs: list):
    return H.bn254_g1.msm(srs.g1_coeff[:len(coeffs)], coeffs)


def open_at_host(srs: SrsKZG, coeffs: list, z: int):
    """KZG opening witness W = [(f(X) - f(z))/(X - z)] (host oracle).

    Returns (eval, W_point).
    """
    # synthetic division: q_i = f_{i+1} + z*q_{i+1}
    n = len(coeffs)
    q = [0] * (n - 1)
    acc = 0
    for i in range(n - 1, 0, -1):
        acc = (acc * z + coeffs[i]) % FR
        q[i - 1] = acc
    fz = (acc * z + coeffs[0]) % FR
    W = commit_coeff_auto(srs, q) if any(q) else None
    return fz, W


def verify_open_trapdoor(srs: SrsKZG, commitment, z: int, value: int, W):
    """Pairing-free KZG check using the test trapdoor:
    C - [value]G == (tau - z) * W  in G1.

    Sound only for test SRS (tau known); verify_open_pairing below is the
    production check.
    """
    assert srs.tau is not None, "trapdoor verify requires test SRS"
    curve = H.bn254_g1
    lhs = curve.add(commitment, curve.neg(curve.mul(curve.gen, value)))
    rhs = curve.mul(W, (srs.tau - z) % FR) if W is not None else None
    return lhs == rhs


def verify_open_batch(srs: SrsKZG, claims) -> bool:
    """Batched pairing KZG check over many opening claims with ONE pairing
    product (halo2's MSM-batched final check shape).

    claims: iterable of (commitment, z, value, W). Each claim asserts
    e(C - [v]G + [z]W, G2) == e(W, [tau]G2); folding with local verifier
    randomness u_i:
      e(Σ u_i (C_i - [v_i]G + [z_i]W_i), G2) · e(-Σ u_i W_i, [tau]G2) == 1.
    """
    import secrets
    from ..curves.pairing import bn254
    curve = H.bn254_g1
    claims = list(claims)
    if not claims:
        return True
    lhs = None      # Σ u_i (C_i - v_i G + z_i W_i)
    wsum = None     # Σ u_i W_i
    for (comm, z, value, W) in claims:
        u = secrets.randbelow(FR - 1) + 1
        term = curve.add(comm, curve.neg(curve.mul(curve.gen, value % FR)))
        if W is not None:
            term = curve.add(term, curve.mul(W, z % FR))
        lhs = curve.add(lhs, curve.mul(term, u))
        if W is not None:
            wsum = curve.add(wsum, curve.mul(W, u))
    if wsum is None:
        return lhs is None
    eng = bn254()
    return eng.pairing_check([(curve.neg(wsum), srs.s_g2), (lhs, srs.g2)])


def verify_open_pairing(srs: SrsKZG, commitment, z: int, value: int, W) -> bool:
    """Production KZG check, product form:
    e(W, [tau]G2) · e([z]W + [v]G - C, G2) == 1
    (equivalent to e(C - [v]G, G2) == e(W, [tau - z]G2))."""
    from ..curves.pairing import bn254
    curve = H.bn254_g1
    if W is None:
        lhs = curve.add(commitment, curve.neg(curve.mul(curve.gen, value)))
        return lhs is None
    acc = curve.add(curve.mul(W, z % FR),
                    curve.add(commitment,
                              curve.neg(curve.mul(curve.gen, value % FR))))
    eng = bn254()
    return eng.pairing_check([(curve.neg(W), srs.s_g2), (acc, srs.g2)])
