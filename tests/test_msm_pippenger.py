"""Sorted-bucket Pippenger MSM vs host oracle (small sizes on CPU)."""
import pytest

from spectre_tpu.poly.msm_pippenger import msm_pippenger
from spectre_tpu.curves import host as H
from spectre_tpu.fields.params import BN254_FR as FR


@pytest.mark.parametrize("n", [1, 2, 13, 40])
def test_pippenger_vs_host(n, rng):
    curve = H.bn254_g1
    pts = [curve.mul(curve.gen, rng.randrange(1, curve.p)) for _ in range(n)]
    scalars = [rng.randrange(FR) for _ in range(n)]
    if n > 1:
        scalars[0] = 0
        pts[-1] = None
    got = msm_pippenger(pts, scalars, "bn254_g1", c=8)
    assert got == curve.msm(pts, scalars)


def test_pippenger_bls_curve(rng):
    curve = H.bls_g1
    pts = [curve.mul(curve.gen, rng.randrange(1, 1 << 64)) for _ in range(9)]
    scalars = [rng.randrange(1 << 255) for _ in range(9)]
    got = msm_pippenger(pts, scalars, "bls12_381_g1", c=8, n_bits=255)
    assert got == curve.msm(pts, scalars)


def test_batch_fixed_base_mul(rng):
    from spectre_tpu.poly.msm import batch_fixed_base_mul
    from spectre_tpu.curves.host import bn254_g1 as curve
    scalars = [0, 1, 2] + [rng.randrange(FR) for _ in range(5)]
    got = batch_fixed_base_mul(scalars, "bn254_g1", chunk=4)
    want = [curve.mul(curve.gen, s) for s in scalars]
    assert got == want


@pytest.mark.slow
def test_commit_dev_flat_vs_host():
    """Device one-call Pippenger (flat all-windows kernel) against the
    host MSM oracle at N=64, both single and batched column paths."""
    import numpy as np
    import random
    from spectre_tpu.curves import host as H
    from spectre_tpu.curves.limbjax import bn254_g1_ops
    from spectre_tpu.fields.params import BN254_FR as FR
    from spectre_tpu.fields import limb as L
    from spectre_tpu.poly.msm_pippenger import commit_dev, commit_dev_many

    rng = random.Random(7)
    N = 64
    pts = [H.bn254_g1.mul(H.bn254_g1.gen, rng.randrange(1, FR))
           for _ in range(N)]
    enc = tuple(map(__import__("jax").numpy.asarray,
                    bn254_g1_ops.encode_points(pts)))
    cols = []
    for _ in range(3):
        scalars = [rng.randrange(0, FR) for _ in range(N)]
        cols.append(scalars)
    want = [H.bn254_g1.msm(pts, c) for c in cols]
    got0 = commit_dev(enc, L.fr_spec.encode_plain_batch(cols[0]))
    assert got0 == want[0]
    S = np.stack([L.fr_spec.encode_plain_batch(c) for c in cols])
    got = commit_dev_many(enc, S)
    assert got == want


def test_commit_dev_t_sliced_parity(rng, monkeypatch):
    """The fused multi-slice commit (one vmapped program + device tree
    combine, the 2^18 bench path) must match both the host oracle and the
    slice-serial path. Slice cap forced tiny so CPU covers it."""
    import numpy as np
    import jax.numpy as jnp
    from spectre_tpu.fields import limb as L
    from spectre_tpu.curves.limbjax import bn254_g1_ops
    from spectre_tpu.poly import msm_pippenger as MP

    curve = H.bn254_g1
    n = 64
    pts = [curve.mul(curve.gen, rng.randrange(1, 1 << 62))
           for _ in range(n)]
    scal = [rng.randrange(FR) for _ in range(n)]
    scal[3] = 0
    Xa, Ya, Za = bn254_g1_ops.encode_points(pts)
    enc = tuple(jnp.asarray(np.ascontiguousarray(np.asarray(c).T))
                for c in (Xa, Ya, Za))
    S = np.zeros((L.fr_spec.n_limbs, n), np.int32)
    for i, s in enumerate(scal):
        S[:, i] = L.int_to_limbs(s, L.fr_spec.limb_bits,
                                 L.fr_spec.n_limbs)
    want = curve.msm(pts, scal)
    assert MP.commit_dev_t(enc, S) == want           # single program
    monkeypatch.setattr(MP, "_T_SLICE_N", 16)        # 4 fused slices
    assert MP.commit_dev_t(enc, S) == want
    monkeypatch.setattr(MP, "_T_SLICE_N", 24)        # non-divisible:
    assert MP.commit_dev_t(enc, S) == want           # slice-serial path
