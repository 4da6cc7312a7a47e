"""JAX limb-tensor modular arithmetic (the TPU compute substrate).

Every field element is a little-endian vector of `n_limbs` base-2^`limb_bits`
limbs stored as int32. With limb_bits=11, products of "relaxed" limbs
(< 2^12) are < 2^24, so a schoolbook convolution plus a full Montgomery REDC
pass accumulates well inside int32 — no 64-bit integers needed, which is the
key constraint of the TPU VPU (cf. SURVEY.md §7 "Hard parts" #2).

Kernel-shape choices are deliberately scatter-free so graphs stay small and
XLA/Mosaic-friendly:
  * schoolbook products are ONE dot_general against a precomputed 0/1
    convolution matrix (MXU-friendly);
  * Montgomery REDC tracks the low-half carry explicitly and adds precomputed
    shifted-modulus rows (full-width adds, no dynamic updates);
  * exact carry propagation is a log-depth associative scan, not a ripple.

Values are kept in Montgomery form (x·R mod p, R = B^n_limbs) and are only
*lazily* reduced: an element may be any representative < c·p for a small
amplitude c (tracked statically by callers; mont_mul output always has c < 2,
and REDC stays exact for amplitude products α·β < B^n_limbs / p — hundreds
for our configs). This lets NTT butterflies and elliptic-curve complete-
addition chains run with zero per-op reductions.

All functions are pure, broadcast over arbitrary leading batch dims, and are
jit/vmap/shard_map friendly (static shapes, no data-dependent control flow).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from . import params as P
from .host import inv_mod


def int_to_limbs(x: int, limb_bits: int, n_limbs: int) -> np.ndarray:
    mask = (1 << limb_bits) - 1
    out = np.zeros(n_limbs, dtype=np.int32)
    for i in range(n_limbs):
        out[i] = x & mask
        x >>= limb_bits
    assert x == 0, "value does not fit in limb vector"
    return out


def limbs_to_int(v, limb_bits: int) -> int:
    acc = 0
    for i, l in enumerate(np.asarray(v).tolist()):
        acc += int(l) << (limb_bits * i)
    return acc


@dataclass(frozen=True)
class FieldSpec:
    """Static configuration for one prime field's limb arithmetic."""

    p: int
    limb_bits: int
    n_limbs: int
    name: str = ""

    # Derived (filled in __post_init__ via object.__setattr__)
    B: int = field(init=False, default=0)
    R: int = field(init=False, default=0)
    R2: int = field(init=False, default=0)
    n0inv: int = field(init=False, default=0)

    def __post_init__(self):
        B = 1 << self.limb_bits
        R = pow(B, self.n_limbs, self.p)
        object.__setattr__(self, "B", B)
        object.__setattr__(self, "R", R)
        object.__setattr__(self, "R2", R * R % self.p)
        # -p^{-1} mod B
        object.__setattr__(self, "n0inv", (-inv_mod(self.p, B)) % B)
        assert self.p < (1 << (self.limb_bits * self.n_limbs)), "p must fit"

    # ---- host-side constant tables (numpy) ----
    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.p, self.limb_bits, self.n_limbs)

    def kp_limbs(self, k: int) -> np.ndarray:
        return int_to_limbs(k * self.p, self.limb_bits, self.n_limbs)

    @functools.cached_property
    def one_mont(self) -> np.ndarray:
        """R mod p in limbs — the Montgomery representation of 1."""
        return int_to_limbs(self.R, self.limb_bits, self.n_limbs)

    @functools.cached_property
    def conv_matrix(self) -> np.ndarray:
        """(n², 2n+1) 0/1 matrix: flat outer-product index (i, j) -> i + j."""
        n = self.n_limbs
        m = np.zeros((n * n, 2 * n + 1), dtype=np.int32)
        for i in range(n):
            for j in range(n):
                m[i * n + j, i + j] = 1
        return m

    @functools.cached_property
    def p_shift_rows(self) -> np.ndarray:
        """(n, 2n+1) rows: limbs of p · B^i (canonical limbs, shifted)."""
        n = self.n_limbs
        m = np.zeros((n, 2 * n + 1), dtype=np.int32)
        for i in range(n):
            m[i, i:i + n] = self.p_limbs
        return m

    @functools.cached_property
    def zero(self) -> np.ndarray:
        return np.zeros(self.n_limbs, dtype=np.int32)

    # ---- host conversions ----
    def to_mont_int(self, x: int) -> int:
        return x * self.R % self.p

    def from_mont_int(self, x: int) -> int:
        return x * inv_mod(self.R, self.p) % self.p

    def encode(self, x: int) -> np.ndarray:
        """python int -> Montgomery limb vector."""
        return int_to_limbs(self.to_mont_int(x % self.p), self.limb_bits, self.n_limbs)

    def encode_batch(self, xs) -> np.ndarray:
        """Vectorized int-list -> Montgomery limb matrix.

        Byte-serializes x·R mod p and extracts base-2^limb_bits limbs with
        numpy unpackbits — ~100x faster than per-value python loops for the
        wide columns MockProver feeds.
        """
        xs = list(xs)
        if not xs:
            return np.zeros((0, self.n_limbs), np.int32)
        R, p = self.R, self.p
        nbytes = (self.limb_bits * self.n_limbs + 7) // 8
        buf = b"".join((x % p * R % p).to_bytes(nbytes, "little") for x in xs)
        raw = np.frombuffer(buf, dtype=np.uint8).reshape(len(xs), nbytes)
        bits = np.unpackbits(raw, axis=1, bitorder="little")
        bits = bits[:, :self.limb_bits * self.n_limbs]
        bits = bits.reshape(len(xs), self.n_limbs, self.limb_bits)
        weights = (1 << np.arange(self.limb_bits, dtype=np.int64))
        return (bits.astype(np.int64) @ weights).astype(np.int32)

    def decode(self, v) -> int:
        """Montgomery limb vector (any amplitude) -> canonical python int."""
        return self.from_mont_int(limbs_to_int(v, self.limb_bits)) % self.p

    def decode_batch(self, a) -> list:
        a = np.asarray(a)
        flat = a.reshape(-1, self.n_limbs)
        return [self.decode(v) for v in flat]

    def decode_plain_batch(self, a) -> list:
        """Vectorized canonical-plain limb matrix -> python ints.

        Numpy byte-accumulation + int.from_bytes per row — ~50x faster than
        per-limb python loops for the 2^20-row columns the prover downloads.
        Input limbs must be canonical (< B)."""
        arr = np.asarray(a).reshape(-1, self.n_limbs).astype(np.int64)
        rows = arr.shape[0]
        if rows == 0:
            return []
        w = (self.limb_bits * self.n_limbs + 7) // 8 + 3
        acc = np.zeros((rows, w), np.int64)
        for i in range(self.n_limbs):
            off = self.limb_bits * i
            j, r = off // 8, off % 8
            v = arr[:, i] << r
            acc[:, j] += v & 0xFF
            acc[:, j + 1] += (v >> 8) & 0xFF
            acc[:, j + 2] += v >> 16
        for j in range(w - 1):
            acc[:, j + 1] += acc[:, j] >> 8
            acc[:, j] &= 0xFF
        buf = acc.astype(np.uint8).tobytes()
        return [int.from_bytes(buf[r * w:(r + 1) * w], "little")
                for r in range(rows)]

    def encode_plain_batch(self, xs) -> np.ndarray:
        """Vectorized int-list -> canonical *plain* limb matrix."""
        xs = list(xs)
        if not xs:
            return np.zeros((0, self.n_limbs), np.int32)
        p = self.p
        nbytes = (self.limb_bits * self.n_limbs + 7) // 8
        buf = b"".join((x % p).to_bytes(nbytes, "little") for x in xs)
        raw = np.frombuffer(buf, dtype=np.uint8).reshape(len(xs), nbytes)
        bits = np.unpackbits(raw, axis=1, bitorder="little")
        bits = bits[:, :self.limb_bits * self.n_limbs]
        bits = bits.reshape(len(xs), self.n_limbs, self.limb_bits)
        weights = (1 << np.arange(self.limb_bits, dtype=np.int64))
        return (bits.astype(np.int64) @ weights).astype(np.int32)

    # plain (non-Montgomery) encodings, for I/O paths
    def encode_plain(self, x: int) -> np.ndarray:
        return int_to_limbs(x % self.p, self.limb_bits, self.n_limbs)

    def decode_plain(self, v) -> int:
        return limbs_to_int(v, self.limb_bits) % self.p


# Shared specs. limb_bits=11 keeps every intermediate strictly inside int32
# (see module docstring); n_limbs chosen so B^n_limbs >= 2^9 * p, giving lazy-
# reduction amplitude headroom of several hundred p.
fr_spec = FieldSpec(P.BN254_FR, 11, 24, name="bn254_fr")        # 264 bits
fq_spec = FieldSpec(P.BN254_FQ, 11, 24, name="bn254_fq")        # 264 bits
bls_fq_spec = FieldSpec(P.BLS12_381_FQ, 11, 36, name="bls12_381_fq")  # 396 bits
bls_fr_spec = FieldSpec(P.BLS12_381_FR, 11, 24, name="bls12_381_fr")  # 264 bits


# ============================ JAX kernels ============================
# All take/return int32 arrays of shape (..., n_limbs). `spec` is closed over
# (static); `make_ops` below builds jitted closures per spec.

def _shift_up(c):
    """Shift a carry vector one limb position up (drop the top carry)."""
    pad = [(0, 0)] * (c.ndim - 1) + [(1, 0)]
    return jnp.pad(c[..., :-1], pad)


def _carry_relax(spec: FieldSpec, t, passes: int = 2):
    """Vectorized carry passes bringing limbs to the relaxed range.

    Works for signed limbs (arithmetic shift + two's-complement mask gives
    exact floor-div/mod). The top carry must vanish for in-range values —
    guaranteed by the amplitude invariant.
    """
    mask = spec.B - 1
    sh = spec.limb_bits
    for _ in range(passes):
        c = t >> sh
        t = (t & mask) + _shift_up(c)
    return t


def _relax_signed(spec: FieldSpec, t, passes: int):
    """Carry passes that never mask the top limb, preserving the value sign.

    Only for bounded signed values (|value| < B^n · 2^-small); the top limb
    accumulates without reduction.
    """
    mask = spec.B - 1
    sh = spec.limb_bits
    for _ in range(passes):
        c = t >> sh
        low = jnp.concatenate([t[..., :-1] & mask, t[..., -1:]], axis=-1)
        t = low + _shift_up(c)
    return t


def _carry_exact(spec: FieldSpec, t):
    """Exact carry propagation -> canonical positional limbs, log-depth.

    Input may be signed. Result limbs are in [0, B) except the top limb,
    which holds the full signed remainder — negative iff the value is
    negative (the sign detector for conditional subtraction).
    """
    # After 3 relaxed passes every non-top carry is in {-1, 0, 1}.
    t = _relax_signed(spec, t, passes=3)
    sh = spec.limb_bits
    mask = spec.B - 1
    # Each limb maps an incoming carry c_in ∈ {-1,0,1} to an outgoing carry;
    # represent the transfer function as its value table (f(-1), f(0), f(1))
    # and compose left-to-right with an associative scan.
    fm = (t - 1) >> sh
    f0 = t >> sh
    fp = (t + 1) >> sh

    def compose(a, b):
        # h = b ∘ a (a is closer to the LSB): h(x) = b(a(x))
        am, a0, ap = a
        bm, b0, bp = b

        def app(x):
            return jnp.where(x == -1, bm, jnp.where(x == 0, b0, bp))

        return (app(am), app(a0), app(ap))

    _, s0, _ = jax.lax.associative_scan(compose, (fm, f0, fp), axis=-1)
    # s0[i] = carry OUT of limb i given zero carry into the LSB; the carry
    # INTO limb i is therefore s0[i-1].
    v = t + _shift_up(s0)
    # Low limbs land in [0, B); the top limb keeps the full signed remainder
    # so its sign is the sign of the value.
    return jnp.concatenate([v[..., :-1] & mask, v[..., -1:]], axis=-1)


def _schoolbook(spec: FieldSpec, a, b):
    """Full (2n+1)-limb product of two relaxed limb vectors.

    Pad-and-sum convolution: n shifted partial products summed as full-width
    vectors — n^2 MACs total (the 0/1-matmul formulation costs n^2·(2n+1)
    MACs on the VPU since int32 dots don't ride the MXU; measured ~20x
    slower on v5e).
    """
    from . import limb_t as _lt
    _lt._check_amp(spec, "_schoolbook", a, b)
    n = spec.n_limbs
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    pad_cfg = [(0, 0)] * len(batch)
    parts = [
        jnp.pad(a[..., i:i + 1] * b, pad_cfg + [(i, n + 1 - i)])
        for i in range(n)
    ]
    t = parts[0]
    for p in parts[1:]:
        t = t + p
    return t


# REDC word-loop policy: unrolled is ~4-6x faster at runtime (XLA fuses the
# iterations, no while-loop HBM roundtrips) but inlines ~10 ops per word per
# call site; scan keeps graphs tiny for compile-heavy compositions (MSM
# Horner bodies etc. set this False around their traces).
REDC_UNROLL = True


class compact_redc:
    """Context manager: trace mont_muls with the scan-based REDC (small
    graphs) — for compositions that inline very many muls (MSM scans)."""

    def __enter__(self):
        global REDC_UNROLL
        self._saved = REDC_UNROLL
        REDC_UNROLL = False

    def __exit__(self, *exc):
        global REDC_UNROLL
        REDC_UNROLL = self._saved


def _redc(spec: FieldSpec, t, unroll: bool | None = None):
    """Montgomery reduction of a (2n+1)-limb accumulator -> n relaxed limbs.

    Scatter-free: low-half carries are tracked in a running scalar, and the
    m·p·B^i contributions are full-width adds of precomputed rows.
    """
    n = spec.n_limbs
    mask = spec.B - 1
    sh = spec.limb_bits
    n0inv = jnp.int32(spec.n0inv)
    p0 = jnp.int32(int(spec.p_limbs[0]))
    rows = jnp.asarray(spec.p_shift_rows)
    c0 = jnp.zeros(t.shape[:-1], dtype=jnp.int32)
    if unroll is None:
        unroll = REDC_UNROLL

    if unroll:
        c = c0
        for i in range(n):
            v = t[..., i] + c
            m = (v & mask) * n0inv & mask
            t = t + m[..., None] * rows[i]
            c = (v + m * p0) >> sh
    else:
        def body(carry, xs):
            t, c = carry
            row, i = xs
            v = jnp.take(t, i, axis=-1) + c
            m = (v & mask) * n0inv & mask
            t = t + m[..., None] * row
            c = (v + m * p0) >> sh
            return (t, c), None

        (t, c), _ = jax.lax.scan(
            body, (t, c0), (rows, jnp.arange(n, dtype=jnp.int32)))
    r = t[..., n:2 * n]
    r = jnp.concatenate([r[..., :1] + c[..., None], r[..., 1:]], axis=-1)
    return _carry_relax(spec, r, passes=2)


def make_ops(spec: FieldSpec):
    """Build the per-field op namespace of jitted closures.

    Eager per-op dispatch is prohibitively slow; every public op is jitted
    (amplitude args are static).
    """

    n = spec.n_limbs

    def _i32(x):
        return jnp.asarray(x, jnp.int32)

    @jax.jit
    def mont_mul(a, b):
        return _redc(spec, _schoolbook(spec, _i32(a), _i32(b)))

    @jax.jit
    def mont_sqr(a):
        a = _i32(a)
        return _redc(spec, _schoolbook(spec, a, a))

    @jax.jit
    def add(a, b):
        return _carry_relax(spec, _i32(a) + _i32(b), passes=1)

    @functools.partial(jax.jit, static_argnames=("amplitude",))
    def sub(a, b, amplitude: int = 2):
        """a - b (+ amplitude*p so the result stays nonnegative).

        `amplitude` must statically bound b: b < amplitude * p.
        """
        off = jnp.asarray(int_to_limbs(amplitude * spec.p, spec.limb_bits, n),
                          dtype=jnp.int32)
        return _carry_relax(spec, _i32(a) + off - _i32(b), passes=2)

    @functools.partial(jax.jit, static_argnames=("amplitude",))
    def neg(a, amplitude: int = 2):
        off = jnp.asarray(int_to_limbs(amplitude * spec.p, spec.limb_bits, n),
                          dtype=jnp.int32)
        return _carry_relax(spec, off - _i32(a), passes=2)

    @jax.jit
    def fold(a):
        """Reduce amplitude to < 2 while staying in Montgomery form."""
        one_m = jnp.asarray(spec.one_mont, dtype=jnp.int32)
        return _redc(spec, _schoolbook(spec, _i32(a), one_m))

    def _cond_sub(a, kp_limbs):
        """a - kp if a >= kp else a; `a` canonical positional (from exact)."""
        d = _carry_exact(spec, a - kp_limbs)
        is_neg = d[..., -1] < 0
        return jnp.where(is_neg[..., None], a, d)

    @functools.partial(jax.jit, static_argnames=("amplitude",))
    def canon(a, amplitude: int = 8):
        """Canonicalize to the unique representative < p.

        `amplitude` statically bounds the input: a < amplitude * p.
        """
        a = _carry_exact(spec, _i32(a))
        k = 1
        while k < amplitude:
            k <<= 1
        k >>= 1
        while k >= 1:
            kp = jnp.asarray(int_to_limbs(k * spec.p, spec.limb_bits, n),
                             dtype=jnp.int32)
            a = _cond_sub(a, kp)
            k >>= 1
        return a

    @jax.jit
    def select(c, a, b):
        """c ? a : b with c a (...)-shaped bool array."""
        return jnp.where(jnp.asarray(c)[..., None], _i32(a), _i32(b))

    @functools.partial(jax.jit, static_argnames=("amplitude",))
    def is_zero(a, amplitude: int = 8):
        """Exact zero test (mod p)."""
        c = canon(a, amplitude)
        return jnp.all(c == 0, axis=-1)

    @functools.partial(jax.jit, static_argnames=("amplitude",))
    def eq(a, b, amplitude: int = 8):
        return is_zero(sub(a, b, amplitude), amplitude + 1)

    @jax.jit
    def from_mont(a):
        """Montgomery -> plain representation (canonical < p)."""
        a = _i32(a)
        one = jnp.zeros_like(a).at[..., 0].set(1)
        return canon(mont_mul(a, one), 2)

    ns = dict(
        spec=spec, mont_mul=mont_mul, mont_sqr=mont_sqr, add=add, sub=sub,
        neg=neg, fold=fold, canon=canon, select=select, is_zero=is_zero,
        eq=eq, from_mont=from_mont,
    )
    return type("FieldOps", (), ns)


fr = make_ops(fr_spec)
fq = make_ops(fq_spec)
bls_fq = make_ops(bls_fq_spec)
bls_fr = make_ops(bls_fr_spec)
