"""Pallas NTT math vs the jnp NTT.

The butterfly math (`_ntt_stages`) and the four-step composition are pure
jnp and run here eagerly via `use_kernel=False` — bit-identical to what the
TPU kernel executes (interpret-mode pallas_call is unusable on CPU; the
pallas_call plumbing is validated on the real chip by bench.py and
scripts/verify_ntt_tpu.py).
"""

import numpy as np
import pytest

from tinyram_tpu.field import FP
from tinyram_tpu.poly import ntt
from tinyram_tpu.poly.pallas_ntt import ntt_pallas


def _rand(n, batch=(), seed=0):
    rng = np.random.default_rng(seed)
    count = n * max(1, int(np.prod(batch)))
    vals = [
        int.from_bytes(rng.bytes(32), "little") % FP.modulus
        for _ in range(count)
    ]
    arr = FP.encode(vals)
    if batch:
        arr = arr.reshape((16,) + tuple(batch) + (n,))
    return arr


# CPU XLA compiles of the unrolled limb kernels are slow (~40 s per
# distinct shape), so the CPU matrix stays small: n=16 (single level) and
# n=512 (two-level recursion with cross twiddles).  Larger sizes and the
# real pallas_call run on the chip via scripts/verify_ntt_tpu.py.
@pytest.mark.parametrize(
    "n", [16, pytest.param(512, marks=pytest.mark.slow)]
)
@pytest.mark.parametrize("inverse", [False, True])
def test_matches_jnp_ntt(n, inverse):
    a = _rand(n, seed=n)
    want = ntt(FP, a, inverse=inverse)
    got = ntt_pallas(FP, a, inverse=inverse, use_kernel=False)
    assert FP.decode(got) == FP.decode(want)


def test_roundtrip():
    a = _rand(512, seed=5)  # same shapes as above: no extra compiles
    back = ntt_pallas(
        FP, ntt_pallas(FP, a, use_kernel=False),
        inverse=True, use_kernel=False,
    )
    assert FP.decode(back) == FP.decode(a)
