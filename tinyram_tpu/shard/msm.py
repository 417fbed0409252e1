"""Multi-chip Pippenger MSM: points sharded per chip, partials combined.

The BASELINE.md "MSM data parallelism" axis: each chip runs the full
single-chip Pippenger (curve.msm) over its block of points, producing one
projective partial sum; the D partials are all-gathered over ICI and
tree-added (point addition is not a ring op, so this is the collective —
an `all_gather` of 3×16 limb vectors per chip — rather than a `psum`).

The shard_map programs are built once per (mesh, shapes) and jitted
(fresh closures would defeat jax's compile cache).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..curve import PointBatch, vesta
from ..curve.msm import choose_window_bits, msm


@lru_cache(maxsize=None)
def _msm_sharded_fn(mesh: Mesh, c: int):
    def local(sc_blk, px, py, pz):
        partial = msm(sc_blk, PointBatch(px, py, pz), window_bits=c)
        coords = jnp.stack([partial.x, partial.y, partial.z], axis=1)
        allp = jax.lax.all_gather(coords, "chips")  # (D, 16, 3)
        acc = vesta.identity(())

        def body(i, acc):
            p = PointBatch(allp[i, :, 0], allp[i, :, 1], allp[i, :, 2])
            return vesta.add(acc, p)

        total = jax.lax.fori_loop(0, allp.shape[0], body, acc)
        return jnp.stack([total.x, total.y, total.z], axis=1)

    spec = P(None, "chips")
    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=P(None, None),
        check_vma=False,
    ))


def msm_sharded(
    mesh: Mesh, scalars_plain: jnp.ndarray, points: PointBatch
) -> PointBatch:
    """MSM with scalars (16, N) and points sharded over the "chips" axis.

    Returns the full (replicated) projective result.
    """
    c = choose_window_bits(scalars_plain.shape[-1] // mesh.devices.size)
    fn = _msm_sharded_fn(mesh, c)
    out = fn(scalars_plain, points.x, points.y, points.z)
    return PointBatch(out[:, 0], out[:, 1], out[:, 2])


@lru_cache(maxsize=None)
def _msm_many_sharded_fn(mesh: Mesh, B: int, c: int):
    from ..curve.msm import msm_many

    def local(sc_blk, px, py, pz):
        partial = msm_many(sc_blk, PointBatch(px, py, pz), window_bits=c)
        coords = jnp.stack([partial.x, partial.y, partial.z], axis=1)
        allp = jax.lax.all_gather(coords, "chips")  # (D, 16, 3, B)
        acc = vesta.identity((B,))

        def body(i, acc):
            p = PointBatch(allp[i, :, 0], allp[i, :, 1], allp[i, :, 2])
            return vesta.add(acc, p)

        total = jax.lax.fori_loop(0, allp.shape[0], body, acc)
        return jnp.stack([total.x, total.y, total.z], axis=1)

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, "chips"), P(None, "chips"),
                  P(None, "chips"), P(None, "chips")),
        out_specs=P(None, None, None),
        check_vma=False,
    ))


def msm_many_sharded(
    mesh: Mesh, scalars_plain: jnp.ndarray, points: PointBatch
) -> PointBatch:
    """Batched MSM of (16, B, N) scalar vectors with points sharded on N.

    Each chip runs the fused multi-column Pippenger (curve.msm.msm_many)
    over its point block; the per-column partials are all-gathered over
    ICI and tree-added.  Returns a replicated PointBatch with batch (B,).
    """
    B = scalars_plain.shape[1]
    c = choose_window_bits(scalars_plain.shape[-1] // mesh.devices.size)
    fn = _msm_many_sharded_fn(mesh, B, c)
    out = fn(scalars_plain, points.x, points.y, points.z)
    return PointBatch(out[:, 0], out[:, 1], out[:, 2])
