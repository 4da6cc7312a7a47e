"""Pallas kernels (interpret mode on the CPU mesh) vs limb oracles."""
import numpy as np
import jax.numpy as jnp

from spectre_tpu.fields import limb as L
from spectre_tpu.fields.pallas_ops import mont_mul_kernel, butterfly_kernel
from spectre_tpu.poly.domain import Domain
from spectre_tpu.poly.ntt_fast import ntt_t, intt_t


def test_pallas_mont_mul(rng):
    spec = L.fr_spec
    xs = [rng.randrange(spec.p) for _ in range(256)]
    ys = [rng.randrange(spec.p) for _ in range(256)]
    A = np.ascontiguousarray(spec.encode_batch(xs).T)
    B = np.ascontiguousarray(spec.encode_batch(ys).T)
    mm = mont_mul_kernel(spec.name, T=128)
    R = np.asarray(mm(jnp.asarray(A), jnp.asarray(B)))
    assert spec.decode_batch(R.T) == [x * y % spec.p for x, y in zip(xs, ys)]


def test_pallas_butterfly(rng):
    spec = L.fr_spec
    n = 128
    tw = [rng.randrange(spec.p) for _ in range(n)]
    od = [rng.randrange(spec.p) for _ in range(n)]
    ev = [rng.randrange(spec.p) for _ in range(n)]
    T = np.ascontiguousarray(spec.encode_batch(tw).T)
    O = np.ascontiguousarray(spec.encode_batch(od).T)
    E = np.ascontiguousarray(spec.encode_batch(ev).T)
    bf = butterfly_kernel(spec.name, T=128)
    lo, hi = bf(jnp.asarray(T), jnp.asarray(O), jnp.asarray(E))
    lo_v = spec.decode_batch(np.asarray(lo).T)
    hi_v = spec.decode_batch(np.asarray(hi).T)
    for i in range(n):
        t = tw[i] * od[i] % spec.p
        assert lo_v[i] == (ev[i] + t) % spec.p
        assert hi_v[i] == (ev[i] - t) % spec.p


def test_pallas_ntt_roundtrip(rng):
    spec = L.fr_spec
    k = 9
    dom = Domain(k)
    coeffs = [rng.randrange(spec.p) for _ in range(1 << k)]
    at = jnp.asarray(np.ascontiguousarray(spec.encode_batch(coeffs).T))
    out = np.asarray(ntt_t(at, k))
    assert spec.decode_batch(out.T) == dom.ntt_host(coeffs)
    back = np.asarray(intt_t(jnp.asarray(out), k))
    assert spec.decode_batch(back.T) == [c % spec.p for c in coeffs]
