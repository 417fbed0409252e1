"""Multi-chip Pippenger MSM: points sharded per chip, partials combined.

The BASELINE.md "MSM data parallelism" axis: each chip runs the full
single-chip Pippenger (curve.msm) over its block of points, producing one
projective partial sum; the D partials are all-gathered over ICI and
tree-added (point addition is not a ring op, so this is the collective —
an `all_gather` of 3×16 limb vectors per chip — rather than a `psum`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curve import PointBatch, vesta
from ..curve.msm import msm


def msm_sharded(
    mesh: Mesh, scalars_plain: jnp.ndarray, points: PointBatch
) -> PointBatch:
    """MSM with scalars (16, N) and points sharded over the "chips" axis.

    Returns the full (replicated) projective result.
    """

    def local(sc_blk, px, py, pz):
        partial = msm(sc_blk, PointBatch(px, py, pz))  # coords (16,)
        coords = jnp.stack([partial.x, partial.y, partial.z], axis=1)  # (16,3)
        allp = jax.lax.all_gather(coords, "chips")  # (D, 16, 3)
        acc = vesta.identity(())

        def body(i, acc):
            p = PointBatch(allp[i, :, 0], allp[i, :, 1], allp[i, :, 2])
            return vesta.add(acc, p)

        total = jax.lax.fori_loop(0, allp.shape[0], body, acc)
        return jnp.stack([total.x, total.y, total.z], axis=1)

    spec = P(None, "chips")
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=P(None, None),
        check_rep=False,
    )
    out = fn(scalars_plain, points.x, points.y, points.z)
    return PointBatch(out[:, 0], out[:, 1], out[:, 2])
