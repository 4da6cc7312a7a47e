"""ICI-sharded NTT over a device mesh (four-step / Bailey decomposition).

Replaces the reference's rayon thread-parallel FFT (halo2_proofs dependency,
SURVEY §2c "intra-proof compute parallelism") with the TPU-native shape.

Derivation (n = n1·n2, n1 = D devices): view x in the cyclic layout
C[j1][j2] = x[j1 + n1·j2] with row j1 resident on device j1. With
k = k2 + n2·k1,

    X[k2 + n2·k1] = Σ_{j1} w_{n1}^{j1·k1} · ω^{j1·k2} ·
                    (Σ_{j2} C[j1][j2] · w_{n2}^{j2·k2})

so the pipeline is: local length-n2 NTT along each row → local twiddle
scale by ω^{j1·k2} → ONE all_to_all (the global transpose, the only ICI
traffic) → local length-n1 NTT across the gathered rows. Input/output
live in natural order; the cyclic-layout moves at the boundary are plain
reshapes/transposes that XLA lowers to resharding collectives.

Bit-exact against the single-device NTT (validated on the 8-way virtual
CPU mesh; the driver dry-runs the same path via __graft_entry__).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as Pspec
from jax.experimental.shard_map import shard_map

from ..fields import limb as L
from ..fields.params import BN254_FR as FR
from ..fields.host import inv_mod
from ..poly.domain import Domain, root_of_unity
from ..poly.ntt import ntt_graph

spec = L.fr_spec
NL = spec.n_limbs


@functools.lru_cache(maxsize=None)
def _local_tables(k: int, inverse: bool):
    dom = Domain(k)
    tables = dom.twiddles_inv if inverse else dom.twiddles_fwd
    return (dom.bitrev.astype(np.int32), tuple(np.asarray(t) for t in tables))


@functools.lru_cache(maxsize=None)
def _mix_twiddles(k: int, D: int, inverse: bool) -> np.ndarray:
    """ω^{j1·k2} Montgomery limbs, shape (D, n2, NL) (row j1 per device)."""
    n = 1 << k
    n2 = n // D
    w = root_of_unity(k)
    if inverse:
        w = inv_mod(w, FR)
    rows = []
    for j1 in range(D):
        base = pow(w, j1, FR)
        vals = [1] * n2
        for i in range(1, n2):
            vals[i] = vals[i - 1] * base % FR
        rows.append(spec.encode_batch(vals))
    return np.stack(rows)


def _ntt_axis(a, k: int, inverse: bool):
    """Pure graph: NTT along axis -2 of (..., 2^k, NL), canonical output."""
    bitrev, tables = _local_tables(k, inverse)
    ops = L.make_ops(spec)
    lead = a.shape[:-2]
    flat = a.reshape((-1, 1 << k, NL))

    def one(row):
        out, amp = ntt_graph(spec, k, row, jnp.asarray(bitrev),
                             tuple(jnp.asarray(t) for t in tables))
        return ops.canon(out, amplitude=1 << max(1, (amp - 1).bit_length()))

    return jax.vmap(one)(flat).reshape(*lead, 1 << k, NL)


_MESHES = {}


@functools.lru_cache(maxsize=None)
def _sharded_jit(k: int, D: int, inverse: bool, scale: bool, mesh_key: int):
    mesh = _MESHES[mesh_key]
    axis = mesh.axis_names[0]
    n = 1 << k
    k1 = (D - 1).bit_length()
    assert (1 << k1) == D and k1 >= 1, "device count must be a power of two"
    k2 = k - k1
    n2 = n >> k1
    ops = L.make_ops(spec)

    def local(c_blk, mix_blk, ninv):
        # c_blk: (1, n2, NL) — this device's row of C
        y = _ntt_axis(c_blk, k2, inverse)            # inner NTT over j2
        y = ops.mont_mul(y, mix_blk)                 # ω^{j1·k2}
        # global transpose: split k2 into D chunks, gather all j1 rows
        z = jax.lax.all_to_all(y, axis, split_axis=1, concat_axis=0,
                               tiled=True)           # (D, n2/D, NL) [j1, k2l]
        z = jnp.swapaxes(z, 0, 1)                    # (n2/D, D, NL)
        o = _ntt_axis(z, k1, inverse)                # outer NTT over j1
        o = jnp.swapaxes(o, 0, 1)                    # (D=k1, n2/D=k2l, NL)
        if scale:
            o = ops.mont_mul(o, ninv)
            o = ops.canon(o, amplitude=2)
        return o[None]                               # (1, D, n2/D, NL)

    in_specs = (Pspec(axis, None, None), Pspec(axis, None, None),
                Pspec(None))
    out_specs = Pspec(axis, None, None, None)
    f = shard_map(local, mesh=mesh, in_specs=in_specs,
                  out_specs=out_specs, check_rep=False)

    @jax.jit
    def run(x_nat, mix, ninv):
        # natural -> cyclic rows: C[j1, j2] = x[j1 + D·j2]
        C = x_nat.reshape(n2, D, NL).swapaxes(0, 1)
        out = f(C, mix, ninv)        # (D, D, n2/D, NL) [k2blk, k1, k2l]
        # natural index k = k2 + n2·k1, k2 = k2blk·(n2/D) + k2l
        out = out.transpose(1, 0, 2, 3).reshape(n, NL)
        return out

    return run


def _run(a, k: int, mesh: Mesh, inverse: bool, scale: bool):
    D = int(np.prod(list(mesh.shape.values())))
    key = id(mesh)
    _MESHES[key] = mesh
    f = _sharded_jit(k, D, inverse, scale, key)
    mix = _mix_twiddles(k, D, inverse)
    ninv = spec.encode(inv_mod(1 << k, FR))
    return f(jnp.asarray(a), jnp.asarray(mix), jnp.asarray(ninv))


def ntt_sharded(a, k: int, mesh: Mesh):
    """Forward NTT of (2^k, NL) Montgomery limbs over the mesh; natural
    order in and out (drop-in for poly.ntt.ntt)."""
    return _run(a, k, mesh, inverse=False, scale=False)


def intt_sharded(a, k: int, mesh: Mesh):
    """Inverse NTT with 1/n scaling."""
    return _run(a, k, mesh, inverse=True, scale=True)
