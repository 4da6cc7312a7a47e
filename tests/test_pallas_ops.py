"""Pallas kernels (interpret mode on the CPU mesh) vs limb oracles."""
import pytest
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


@pytest.mark.heavy
def test_pallas_padd_awkward_widths(rng):
    """lax.associative_scan feeds the fused-add kernels odd and zero-length
    lane slices (halving recursion); the wrappers must pad/slice, not
    assert (round-4 TPU sanity crash: ZeroDivisionError at N=0)."""
    from spectre_tpu.curves import host as H
    from spectre_tpu.curves.limbjax import bn254_g1_ops as rops
    from spectre_tpu.fields.pallas_ops import padd_kernel, padd_seg_kernel

    spec = rops.spec
    addk = padd_kernel(spec.name, rops.b, T=128)
    segk = padd_seg_kernel(spec.name, rops.b, T=128)

    def enc_t(pts):
        X, Y, Z = rops.encode_points(pts)
        return tuple(jnp.asarray(np.ascontiguousarray(np.asarray(c).T))
                     for c in (X, Y, Z))

    def dec_t(coords):
        return rops.decode_points(
            tuple(np.ascontiguousarray(np.asarray(c).T) for c in coords))

    for N in (0, 1, 130):
        pa = [H.bn254_g1.mul(H.bn254_g1.gen, rng.randrange(1, 1 << 60))
              for _ in range(N)]
        pb = [H.bn254_g1.mul(H.bn254_g1.gen, rng.randrange(1, 1 << 60))
              for _ in range(N)]
        A, B = enc_t(pa), enc_t(pb)
        got = dec_t(addk(*A, *B))
        want = [H.bn254_g1.add(x, y) for x, y in zip(pa, pb)]
        assert got == want, f"padd N={N}"
        flags = np.asarray(
            [rng.randrange(2) for _ in range(N)], np.int32)[None, :]
        sx, sy, sz, sf = segk(*A, jnp.asarray(flags), *B, jnp.asarray(flags))
        gseg = dec_t((sx, sy, sz))
        for i in range(N):
            exp = pb[i] if flags[0, i] else H.bn254_g1.add(pa[i], pb[i])
            assert gseg[i] == exp, f"seg N={N} i={i}"
