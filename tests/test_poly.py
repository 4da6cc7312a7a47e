"""NTT and MSM vs host oracles."""
import numpy as np
import pytest

from spectre_tpu.fields import limb as L
from spectre_tpu.fields.params import BN254_FR as FR
from spectre_tpu.poly.domain import Domain, root_of_unity
from spectre_tpu.poly.ntt import ntt, intt
from spectre_tpu.poly import msm as M
from spectre_tpu.curves import host as H


def test_root_of_unity():
    for k in (1, 4, 10):
        w = root_of_unity(k)
        assert pow(w, 1 << k, FR) == 1
        assert pow(w, 1 << (k - 1), FR) == FR - 1


def test_ntt_host_oracle_small():
    dom = Domain(3)
    coeffs = [3, 1, 4, 1, 5, 9, 2, 6]
    evals = dom.ntt_host(coeffs)
    # direct evaluation check
    for i in range(8):
        x = pow(dom.omega, i, FR)
        want = sum(c * pow(x, j, FR) for j, c in enumerate(coeffs)) % FR
        assert evals[i] == want
    assert dom.intt_host(evals) == [c % FR for c in coeffs]


@pytest.mark.parametrize("k", [4, 8])
def test_ntt_jax_vs_host(k, rng):
    dom = Domain(k)
    spec = L.fr_spec
    coeffs = [rng.randrange(FR) for _ in range(1 << k)]
    a = spec.encode_batch(coeffs)
    out = np.asarray(ntt(a, k))
    got = spec.decode_batch(out)
    assert got == dom.ntt_host(coeffs)
    back = np.asarray(intt(out, k))
    assert spec.decode_batch(back) == [c % FR for c in coeffs]


def test_msm_small_vs_host(rng):
    curve = H.bn254_g1
    n = 5
    pts = [curve.mul(curve.gen, rng.randrange(1, curve.p)) for _ in range(n)]
    scalars = [rng.randrange(FR) for _ in range(n)]
    got = M.msm(pts, scalars, "bn254_g1")
    want = curve.msm(pts, scalars)
    assert got == want


def test_msm_with_identity_and_zero_scalar(rng):
    curve = H.bn254_g1
    pts = [curve.gen, None, curve.mul(curve.gen, 7)]
    scalars = [0, 5, 3]
    got = M.msm(pts, scalars, "bn254_g1")
    want = curve.mul(curve.gen, 21)
    assert got == want


def test_halo2_srs_file_roundtrip(tmp_path):
    """halo2 ParamsKZG .srs format: write/read round-trip + on-curve and
    tau-consistency pairing validation + cached_srs precedence."""
    import os
    from spectre_tpu.poly import kzg
    srs = kzg.test_srs(3)
    p = str(tmp_path / "kzg_bn254_3.srs")
    kzg.write_params_halo2(srs, p)
    got = kzg.read_params_halo2(p)
    assert got.k == 3 and got.tau is None
    assert got.g1_coeff == srs.g1_coeff
    assert got.g1_lagrange == srs.g1_lagrange
    assert got.g2 == srs.g2 and got.s_g2 == srs.s_g2
    # corrupt one coordinate byte -> validation fails
    blob = bytearray(open(p, "rb").read())
    blob[20] ^= 1
    bad = str(tmp_path / "kzg_bn254_bad.srs")
    open(bad, "wb").write(bytes(blob))
    import pytest
    with pytest.raises(AssertionError):
        kzg.read_params_halo2(bad)
    # cached_srs picks up the halo2-format file from PARAMS_DIR
    got2 = kzg.cached_srs(3, params_dir=str(tmp_path))
    assert got2.g1_coeff == srs.g1_coeff and got2.tau is None


def test_coset_intt_pieces_matches_full_intt(rng):
    """Per-sub-coset inverse (f size-n INTTs + f-point DFT across
    sub-cosets) must equal the interleaved 2^ext_k coset INTT split into
    blocks — the prover's h-assembly path (r5 OOM #8 fix)."""
    from spectre_tpu.poly import fr_vec as FV

    k, ext_k = 4, 6
    f, n = 1 << (ext_k - k), 1 << k
    shift = 7
    coeffs = [rng.randrange(FR) for _ in range(f * n)]
    dev = FV.upload_ints(coeffs, f * n)
    full = FV.coset_ntt(dev, ext_k, shift)          # evals at shift*w_ext^p
    subs = [full[:, j::f] for j in range(f)]        # sub-coset j = p≡j (f)
    pieces = FV.coset_intt_pieces(subs, k, ext_k, shift)
    got = FV.download_ints(pieces)                  # f blocks of n
    assert got == coeffs
