"""MXU digit-matmul NTT vs the jnp NTT (exact int32 dots on CPU)."""

import numpy as np
import pytest

from tinyram_tpu.field import FP
from tinyram_tpu.poly import ntt
from tinyram_tpu.poly.mxu_ntt import (
    N_DIGITS,
    digits_cols_to_mont,
    limbs_to_digits7,
    ntt_mxu,
)


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    vals = [
        int.from_bytes(rng.bytes(32), "little") % FP.modulus
        for _ in range(n)
    ]
    return FP.encode(vals), vals


def test_digit_roundtrip():
    a, vals = _rand(5, seed=3)
    d = np.asarray(limbs_to_digits7(FP.from_mont(a)))
    for i, v in enumerate(vals):
        rec = sum(int(d[k, i]) << (7 * k) for k in range(N_DIGITS))
        assert rec == v


@pytest.mark.parametrize(
    "n", [8, pytest.param(512, marks=pytest.mark.slow)]
)
@pytest.mark.parametrize("inverse", [False, True])
def test_matches_jnp_ntt(n, inverse):
    a, _ = _rand(n, seed=n + int(inverse))
    want = ntt(FP, a, inverse=inverse)
    got = ntt_mxu(FP, a, inverse=inverse)
    assert FP.decode(got) == FP.decode(want)
