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
