"""Mesh context: opt-in multi-chip execution for the whole prover.

`create_proof` is a host-orchestrated sequence of device phases (NTT,
MSM commits, extended-coset constraint evaluation, grand-product scans).
Rather than a second sharded prover implementation, the single-source
prover consults this context at each device phase:

  * Domain transforms route to the all-to-all 4-step NTT (shard/ntt.py),
  * commit MSMs route to point-sharded Pippenger partials (shard/msm.py),
  * elementwise phases run on row-sharded arrays under GSPMD (XLA inserts
    the halo collective-permutes for Rotation::next rolls itself).

The reference has no distributed layer at all (SURVEY.md §2 "Parallelism
strategies: none"); this is the BASELINE.md scaling axis.
"""

from __future__ import annotations

import contextlib

from jax.sharding import Mesh

_ACTIVE: list[Mesh] = []


def current_mesh() -> Mesh | None:
    return _ACTIVE[-1] if _ACTIVE else None


@contextlib.contextmanager
def mesh_context(mesh: Mesh | None):
    if mesh is None:
        yield
        return
    _ACTIVE.append(mesh)
    try:
        yield
    finally:
        _ACTIVE.pop()
