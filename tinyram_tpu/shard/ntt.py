"""Multi-chip NTT: 4-step algorithm with all-to-all stage exchange.

The BASELINE.md "NTT stage parallelism" axis: a size-n transform is split as
n = R·C; column NTTs of size R run chip-local, a twiddle multiply, an
`all_to_all` transpose over the mesh (ICI), then row NTTs of size C, and a
second all-to-all restores natural output order.  Both compute phases are
the single-chip `poly.ntt` kernel, so one code path serves 1 chip → pod.

Derivation (index split j = q·C + s, k = t·R + u):
  A[tR+u] = NTT_C over s of [ ω_n^{su} · (NTT_R over q of a[qC+s])[u, s] ]
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..field.jfield import FP, Field
from ..field.params import N_LIMBS, int_to_limbs
from ..poly.ntt import ntt, omega_for


@lru_cache(maxsize=None)
def _twiddle_matrix(field_name: str, log_n: int, inverse: bool) -> np.ndarray:
    """(16, R, C) Montgomery table of ω^{u·s}."""
    field = FP
    assert field_name == "Fp"
    n = 1 << log_n
    R = 1 << ((log_n + 1) // 2)
    C = n // R
    p = field.modulus
    omega = omega_for(field, log_n, inverse)
    # all powers ω^j via running product (host ints)
    pows = [1] * n
    for j in range(1, n):
        pows[j] = pows[j - 1] * omega % p
    r_mod = field.params.r_mod_p
    mont = np.empty((n, N_LIMBS), dtype=np.uint32)
    for j in range(n):
        mont[j] = int_to_limbs(pows[j] * r_mod % p)
    exps = (np.outer(np.arange(R, dtype=np.int64),
                     np.arange(C, dtype=np.int64)) % n)
    tw = mont[exps]  # (R, C, 16)
    return np.ascontiguousarray(np.moveaxis(tw, -1, 0))  # (16, R, C)


def _split_rc(log_n: int):
    R = 1 << ((log_n + 1) // 2)
    return R, (1 << log_n) // R


def ntt_sharded(
    mesh: Mesh, a: jnp.ndarray, inverse: bool = False, field: Field = FP
) -> jnp.ndarray:
    """Distributed NTT of (16, ..., n) along the mesh's "chips" axis.

    Input/output are block-sharded on the last axis (leading batch dims
    are replicated as given); output is in natural order (inverse=True
    includes the 1/n scale).
    """
    n = a.shape[-1]
    log_n = n.bit_length() - 1
    assert (1 << log_n) == n
    fn = _ntt_sharded_fn(mesh, field.params.name, log_n, inverse, a.ndim - 2)
    tw = jnp.asarray(_twiddle_matrix(field.params.name, log_n, inverse))
    return fn(a, tw)


@lru_cache(maxsize=None)
def _ntt_sharded_fn(
    mesh: Mesh, field_name: str, log_n: int, inverse: bool, nb: int
):
    """Cached jitted shard_map program (a fresh closure per call would
    defeat jax's compile cache — every prover NTT would recompile)."""
    field = FP
    assert field_name == "Fp"
    D = mesh.devices.size
    R, C = _split_rc(log_n)
    assert R % D == 0 and C % D == 0, f"mesh {D} must divide {R}x{C}"

    def local(a_blk, tw_blk):
        lead = a_blk.shape[:-1]
        ax = len(lead)  # index of the row axis once reshaped to (..., R/D, C)
        # block sharding of flat j = q·C + s gives each chip R/D complete
        # q-rows: local (16, ..., R/D, C)
        a_mat = a_blk.reshape(*lead, -1, C)
        # gather all q for a local s-chunk: -> (16, ..., R, C/D)
        a_mat = jax.lax.all_to_all(
            a_mat, "chips", split_axis=ax + 1, concat_axis=ax, tiled=True
        )
        # col NTTs (size R) along q
        f1 = jnp.moveaxis(
            ntt(field, jnp.moveaxis(a_mat, -2, -1), inverse), -1, -2
        )
        twb = tw_blk.reshape(
            (tw_blk.shape[0],) + (1,) * nb + tw_blk.shape[1:]
        )
        f1 = field.mul(f1, twb)  # ω^{su}, tw sharded on s
        # redistribute: (16, ..., R, C/D) -> (16, ..., R/D, C)
        f1 = jax.lax.all_to_all(
            f1, "chips", split_axis=ax, concat_axis=ax + 1, tiled=True
        )
        f2 = ntt(field, f1, inverse)  # row NTTs (size C); local 1/R·1/C = 1/n
        # natural order A[t·R+u]: transpose to [t, u] and reshard on t
        f2 = jnp.moveaxis(f2, -1, -2)  # (16, ..., C, R/D)
        f2 = jax.lax.all_to_all(
            f2, "chips", split_axis=ax, concat_axis=ax + 1, tiled=True
        )
        # (16, ..., C/D, R): local flat t_l·R + u is the natural block ✓
        return f2.reshape(*lead, -1)

    spec = P(*([None] * (nb + 1) + ["chips"]))
    tw_spec = P(None, None, "chips")
    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(spec, tw_spec), out_specs=spec,
        check_vma=False,
    ))
