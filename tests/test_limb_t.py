"""Transposed-limb ops (fields/limb_t.py) parity against the AoS ops and
the python-int oracle — the correctness pin for the round-3 layout
migration."""
import numpy as np
import jax.numpy as jnp
import pytest

from spectre_tpu.fields import limb as L
from spectre_tpu.fields import limb_t as T
from spectre_tpu.fields.params import BN254_FR as FR

spec = L.fr_spec
ops = L.make_ops(spec)
ops_t = T.make_ops_t("bn254_fr")


def _enc_cols(vals):
    """ints -> transposed (NL, n) Montgomery."""
    return jnp.asarray(np.stack([spec.encode(v) for v in vals]).T)


def _dec_cols(a_t):
    out = np.asarray(T.from_t(a_t))
    return [spec.from_mont_int(v) % FR
            for v in spec.decode_plain_batch(np.asarray(
                ops.canon(jnp.asarray(out), 4)))]


@pytest.fixture
def vals(rng):
    return ([rng.randrange(FR) for _ in range(16)],
            [rng.randrange(FR) for _ in range(16)])


def test_roundtrip_layout(vals):
    a, _ = vals
    at = _enc_cols(a)
    assert at.shape == (spec.n_limbs, 16)
    assert _dec_cols(at) == a


def test_mont_mul_parity(vals):
    a, b = vals
    got = _dec_cols(ops_t.mont_mul(_enc_cols(a), _enc_cols(b)))
    want = [x * y % FR for x, y in zip(a, b)]
    assert got == want
    # AoS/T cross-check on the same inputs
    aos = ops.mont_mul(jnp.asarray(spec.encode_batch(a)),
                       jnp.asarray(spec.encode_batch(b)))
    assert np.array_equal(np.asarray(T.from_t(
        ops_t.mont_mul(_enc_cols(a), _enc_cols(b)))), np.asarray(aos))


def test_add_sub_fold_parity(vals):
    a, b = vals
    s = ops_t.add(_enc_cols(a), _enc_cols(b))
    assert _dec_cols(s) == [(x + y) % FR for x, y in zip(a, b)]
    d = ops_t.sub(_enc_cols(a), _enc_cols(b), amplitude=2)
    assert _dec_cols(d) == [(x - y) % FR for x, y in zip(a, b)]
    f = ops_t.fold(s)
    assert _dec_cols(f) == [(x + y) % FR for x, y in zip(a, b)]


def test_canon_parity(vals):
    a, b = vals
    s = ops_t.add(ops_t.add(_enc_cols(a), _enc_cols(b)),
                  _enc_cols(a))                      # amplitude 3
    v = ops_t.canon(s, amplitude=4)
    want = [(2 * x + y) % FR for x, y in zip(a, b)]
    got = [spec.from_mont_int(x) % FR
           for x in spec.decode_plain_batch(
               np.asarray(T.from_t(v)))]
    assert got == want


def test_transposed_curve_add_parity(rng):
    """CurveOpsT complete addition/doubling vs the host curve oracle."""
    import functools
    from spectre_tpu.curves import host as H
    from spectre_tpu.curves.limbjax import bn254_g1_ops, bn254_g1_ops_t
    pts = [H.bn254_g1.mul(H.bn254_g1.gen, rng.randrange(1, FR))
           for _ in range(6)]
    X, Y, Z = bn254_g1_ops.encode_points(pts)       # (6, NL) each
    Pt = tuple(jnp.asarray(c).T for c in (X, Y, Z))  # (NL, 6)
    A = tuple(c[:, :3] for c in Pt)
    B = tuple(c[:, 3:] for c in Pt)
    S = bn254_g1_ops_t.padd_graph(A, B)
    D = bn254_g1_ops_t.pdbl_graph(A)
    # decode through the AoS decoder after transposing back
    got_sum = bn254_g1_ops.decode_points(
        tuple(np.asarray(c).T for c in S))
    got_dbl = bn254_g1_ops.decode_points(
        tuple(np.asarray(c).T for c in D))
    want_sum = [H.bn254_g1.add(p, q) for p, q in zip(pts[:3], pts[3:])]
    want_dbl = [H.bn254_g1.add(p, p) for p in pts[:3]]
    assert got_sum == want_sum
    assert got_dbl == want_dbl


@pytest.mark.slow
def test_transposed_commit_vs_host(rng):
    """Transposed-layout Pippenger commit (commit_dev_t) vs the host MSM
    oracle (N=64; slow: kernel compile dominates on CPU)."""
    from spectre_tpu.curves import host as H
    from spectre_tpu.curves.limbjax import bn254_g1_ops
    from spectre_tpu.poly.msm_pippenger import commit_dev_t
    N = 64
    pts = [H.bn254_g1.mul(H.bn254_g1.gen, rng.randrange(1, FR))
           for _ in range(N)]
    X, Y, Z = bn254_g1_ops.encode_points(pts)
    enc_t = tuple(jnp.asarray(c).T for c in (X, Y, Z))
    scalars = [rng.randrange(0, FR) for _ in range(N)]
    got = commit_dev_t(enc_t, spec.encode_plain_batch(scalars).T)
    assert got == H.bn254_g1.msm(pts, scalars)


@pytest.mark.slow
def test_transposed_commit_many_vs_host(rng):
    from spectre_tpu.curves import host as H
    from spectre_tpu.curves.limbjax import bn254_g1_ops
    from spectre_tpu.poly.msm_pippenger import commit_dev_many_t
    N = 64
    pts = [H.bn254_g1.mul(H.bn254_g1.gen, rng.randrange(1, FR))
           for _ in range(N)]
    X, Y, Z = bn254_g1_ops.encode_points(pts)
    enc_t = tuple(jnp.asarray(c).T for c in (X, Y, Z))
    cols = [[rng.randrange(0, FR) for _ in range(N)] for _ in range(3)]
    got = commit_dev_many_t(
        enc_t, np.stack([spec.encode_plain_batch(c).T for c in cols]))
    assert got == [H.bn254_g1.msm(pts, c) for c in cols]


@pytest.mark.slow
def test_transposed_commit_sliced_vs_host(rng, monkeypatch):
    """N > _T_SLICE_N splits into independent slice-MSMs host-added at the
    end (the path k>=18 commits take; the remote compile helper cannot
    optimize a 2^18-wide scan — msm_pippenger._T_SLICE_N)."""
    from spectre_tpu.curves import host as H
    from spectre_tpu.curves.limbjax import bn254_g1_ops
    from spectre_tpu.poly import msm_pippenger as MP
    monkeypatch.setattr(MP, "_T_SLICE_N", 32)
    N = 64
    pts = [H.bn254_g1.mul(H.bn254_g1.gen, rng.randrange(1, FR))
           for _ in range(N)]
    X, Y, Z = bn254_g1_ops.encode_points(pts)
    enc_t = tuple(jnp.asarray(c).T for c in (X, Y, Z))
    scalars = [rng.randrange(0, FR) for _ in range(N)]
    got = MP.commit_dev_t(enc_t, spec.encode_plain_batch(scalars).T)
    assert got == H.bn254_g1.msm(pts, scalars)
    cols = [scalars, [rng.randrange(0, FR) for _ in range(N)]]
    got_many = MP.commit_dev_many_t(
        enc_t, np.stack([spec.encode_plain_batch(c).T for c in cols]))
    assert got_many == [H.bn254_g1.msm(pts, c) for c in cols]


def test_checked_mode_catches_amplitude_violation(monkeypatch):
    """SPECTRE_CHECKED converts a lazy-reduction bound violation from
    'silent int32 wrap -> corrupt proof' into a loud error (VERDICT r3
    weak #7)."""
    import numpy as np
    import jax
    import pytest
    from spectre_tpu.fields import limb as L
    from spectre_tpu.fields import limb_t as LT

    monkeypatch.setattr(LT, "_CHECKED", True)
    spec = L.fr_spec
    ops = LT.make_ops_t("bn254_fr")
    # unique shapes force a fresh trace so the check callback is embedded
    ok = np.asarray(spec.encode(12345))[:, None] * np.ones((1, 3), np.int32)
    out = ops.mont_mul(ok, ok)
    jax.block_until_ready(out)          # legal amplitude: no error

    bad = (np.asarray(spec.encode(12345))[:, None]
           * np.ones((1, 5), np.int32))     # fresh shape -> fresh trace
    bad[0, 0] = 1 << (spec.limb_bits + 3)   # way past the relaxed bound
    with pytest.raises(Exception, match="amplitude"):
        jax.block_until_ready(ops.mont_mul(bad, bad))
