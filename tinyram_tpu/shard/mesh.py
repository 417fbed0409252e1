"""Device mesh helpers for the multi-chip prover.

The reference is single-process with no distributed layer (SURVEY.md §2
"Parallelism strategies: none"); tinyram-tpu's parallelism axes are defined
by BASELINE.md: MSM data parallelism (points sharded per chip, bucket
reduction over ICI), NTT stage parallelism (all-to-all transposes), and
row-sharded witness/quotient evaluation.  All of it runs over one 1-D mesh
axis ``"chips"``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            assert len(devices) >= n_devices, (
                f"need {n_devices} devices, have {len(devices)}"
            )
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("chips",))
