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


@pytest.mark.parametrize("inverse", [False, True])
def test_four_step_recursion_small_base(inverse):
    """Multi-level recursion + cross twiddles in the fast tier (ADVICE r3):
    forcing s_max=16 on a 256-point transform exercises two recursion
    levels with the cheap jnp base — same composition code the chip runs
    at n>=512 — without the ~100 s 512-point CPU kernel compiles."""
    from tinyram_tpu.field.params import N_LIMBS
    from tinyram_tpu.poly.pallas_ntt import _base_jnp, four_step

    n, cols = 256, 2
    a = _rand(n, batch=(cols,), seed=77)
    x = np.moveaxis(np.asarray(a), 1, 2)  # (16, n, cols)
    import jax.numpy as jnp

    got = four_step(jnp.asarray(x), "Fp", inverse, None, _base_jnp, 16)
    got = jnp.moveaxis(got, 2, 1)
    want = ntt(FP, a, inverse=inverse)
    if inverse:  # four_step omits the 1/n scale (applied by ntt_pallas)
        n_inv = pow(n, FP.modulus - 2, FP.modulus)
        got = FP.mul(got, FP.const(n_inv, 2))
    assert FP.decode(got) == FP.decode(want)


def test_roundtrip():
    a = _rand(512, seed=5)  # same shapes as above: no extra compiles
    back = ntt_pallas(
        FP, ntt_pallas(FP, a, use_kernel=False),
        inverse=True, use_kernel=False,
    )
    assert FP.decode(back) == FP.decode(a)
