"""Proving/verifying key persistence.

The reference rebuilds Params/pk/vk on every run (SURVEY.md §5
"Checkpoint/resume: none — the TPU build should persist SRS/pk arrays");
here keys round-trip through a single .npz (the SRS already persists via
ipa.srs).  The ConstraintSystem itself is code, so loading re-derives it
from the circuit builder and the file carries only array data +
commitments.
"""

from __future__ import annotations

import numpy as np

from ..curve.host import AffinePoint
from ..field.params import N_LIMBS
from ..poly.domain import Domain
from ..field.jfield import FP
from .circuit import ConstraintSystem
from .keygen import ProvingKey, VerifyingKey


def _points_to_arr(points: list[AffinePoint]) -> np.ndarray:
    out = np.zeros((len(points), 2, 32), dtype=np.uint8)
    for i, pt in enumerate(points):
        if pt is None:
            continue
        out[i, 0] = np.frombuffer(pt[0].to_bytes(32, "little"), np.uint8)
        out[i, 1] = np.frombuffer(pt[1].to_bytes(32, "little"), np.uint8)
    return out


def _arr_to_points(arr: np.ndarray) -> list[AffinePoint]:
    out = []
    for i in range(arr.shape[0]):
        x = int.from_bytes(arr[i, 0].tobytes(), "little")
        y = int.from_bytes(arr[i, 1].tobytes(), "little")
        out.append(None if x == 0 and y == 0 else (x, y))
    return out


def save_pk(path: str, pk: ProvingKey) -> None:
    np.savez_compressed(
        path,
        k=pk.vk.k,
        extended_k=pk.vk.extended_k,
        fixed_lag=np.stack([np.asarray(v) for v in pk.fixed_lag])
        if pk.fixed_lag else np.zeros((0, N_LIMBS, 1), np.uint32),
        fixed_coeff=np.stack([np.asarray(v) for v in pk.fixed_coeff])
        if pk.fixed_coeff else np.zeros((0, N_LIMBS, 1), np.uint32),
        sigma_lag=np.stack([np.asarray(v) for v in pk.sigma_lag])
        if pk.sigma_lag else np.zeros((0, N_LIMBS, 1), np.uint32),
        sigma_coeff=np.stack([np.asarray(v) for v in pk.sigma_coeff])
        if pk.sigma_coeff else np.zeros((0, N_LIMBS, 1), np.uint32),
        fixed_comms=_points_to_arr(pk.vk.fixed_commitments),
        sigma_comms=_points_to_arr(pk.vk.sigma_commitments),
        perm_cols=np.array(
            [(c.kind, str(c.index)) for c in pk.vk.perm_columns], dtype="U16"
        ).reshape(-1, 2),
    )


def load_pk(path: str, cs: ConstraintSystem) -> ProvingKey:
    import jax.numpy as jnp

    from .circuit import Column

    data = np.load(path)
    k = int(data["k"])
    ek = int(data["extended_k"])
    perm_cols = [
        Column(kind, int(idx)) for kind, idx in data["perm_cols"]
    ]
    vk = VerifyingKey(
        cs=cs,
        k=k,
        extended_k=ek,
        fixed_commitments=_arr_to_points(data["fixed_comms"]),
        sigma_commitments=_arr_to_points(data["sigma_comms"]),
        perm_columns=perm_cols,
    )
    return ProvingKey(
        vk=vk,
        domain=Domain(FP, k, ek),
        fixed_lag=[jnp.asarray(v) for v in data["fixed_lag"]],
        fixed_coeff=[jnp.asarray(v) for v in data["fixed_coeff"]],
        sigma_lag=[jnp.asarray(v) for v in data["sigma_lag"]],
        sigma_coeff=[jnp.asarray(v) for v in data["sigma_coeff"]],
    )
