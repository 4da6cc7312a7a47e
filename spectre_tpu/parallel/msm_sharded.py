"""Data-parallel Pippenger MSM over a device mesh.

Points and scalars shard over the mesh axis; each device runs the full
one-call sorted-bucket Pippenger (msm_pippenger._commit_jit) on its local
slice, partial sums are all_gathered (a projective point is 3 limb vectors
— EC addition is not psum-able) and tree-reduced replicated. One collective
per MSM; work scales 1/D per chip (SURVEY §2c Pippenger-sharding row).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as Pspec
from jax.experimental.shard_map import shard_map

from ..fields import limb as L
from ..poly.msm_pippenger import CURVES, _commit_jit

_MESHES = {}


@functools.lru_cache(maxsize=None)
def _sharded_jit(curve_name: str, D: int, mesh_key: int):
    mesh = _MESHES[mesh_key]
    axis = mesh.axis_names[0]
    cops = CURVES[curve_name][0]
    inner = _commit_jit(curve_name)

    def local(X, Y, Z, S):
        px, py, pz = inner(X, Y, Z, S)
        gx = jax.lax.all_gather(px, axis)    # (D, nl)
        gy = jax.lax.all_gather(py, axis)
        gz = jax.lax.all_gather(pz, axis)
        P = (gx, gy, gz)
        n = D
        while n > 1:
            half = n // 2
            lo = tuple(c[:half] for c in P)
            hi = tuple(c[half:2 * half] for c in P)
            s = cops.padd_graph(lo, hi)
            if n % 2:
                P = tuple(jnp.concatenate([a, c[n - 1:n]])
                          for a, c in zip(s, P))
            else:
                P = s
            n = P[0].shape[0]
        return tuple(c[0] for c in P)

    in_specs = (Pspec(axis, None),) * 4
    out_specs = (Pspec(None),) * 3
    f = shard_map(local, mesh=mesh, in_specs=in_specs,
                  out_specs=out_specs, check_rep=False)
    return jax.jit(f)


def msm_sharded(points_enc, scalars_plain, mesh: Mesh,
                curve: str = "bn254_g1"):
    """(X, Y, Z) device base arrays + (N, 24) plain-limb scalars, N a
    multiple of the device count -> affine host point | None."""
    D = int(np.prod(list(mesh.shape.values())))
    key = id(mesh)
    _MESHES[key] = mesh
    cops = CURVES[curve][0]
    X, Y, Z = points_enc
    assert X.shape[0] % D == 0, "N must divide evenly across devices"
    with L.compact_redc():
        out = _sharded_jit(curve, D, key)(X, Y, Z, jnp.asarray(scalars_plain))
    return cops.decode_points(
        tuple(np.asarray(c)[None] for c in out))[0]
