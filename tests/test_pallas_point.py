"""Fused point-kernel arithmetic vs the jnp vesta path.

The Pallas kernel bodies (curve/pallas_point.py) are pure jnp functions of
limb-vector lists, so we evaluate them eagerly on CPU and compare
bit-exactly against curve/vesta.py.  (Interpret-mode pallas_call is not
usable here: XLA:CPU takes minutes to compile the ~12k inlined callback
ops.)  The pallas_call plumbing itself (BlockSpec/grid/padding) is
validated on the real chip by scripts/bench_msm.py, which cross-checks
full MSMs against the host oracle.
"""

import random

import jax.numpy as jnp
import numpy as np

from tinyram_tpu.curve import PointBatch, from_affine_host, vesta
from tinyram_tpu.curve.pallas_point import (
    _add_body,
    _fq_consts,
    _pdouble_kernel,
    _mul_by_3b,
)
from tinyram_tpu.field import FQ
from tinyram_tpu.field.params import N_LIMBS
from tinyram_tpu.field.pallas_mul import (
    mod_add_vecs,
    mod_sub_vecs,
    mont_mul_vecs,
)

from test_curve import gen_points


def _vecs(arr):
    return [arr[i] for i in range(N_LIMBS)]


def _stack(vecs):
    return jnp.stack(vecs)


def _mixed_batch(n, seed):
    pts = gen_points(n - 2, seed=seed) + [None, None]
    random.Random(seed).shuffle(pts)
    return from_affine_host(pts)


def test_field_vec_helpers_match_jfield():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 1 << 16, size=(2, 16, 32)).astype(np.uint32)
    raw[:, 15] &= 0x3FFF
    a, b = jnp.asarray(raw[0]), jnp.asarray(raw[1])
    p_limbs, n0inv = _fq_consts()
    assert jnp.array_equal(
        _stack(mont_mul_vecs(_vecs(a), _vecs(b), p_limbs, n0inv)),
        FQ.mul(a, b),
    )
    assert jnp.array_equal(
        _stack(mod_add_vecs(_vecs(a), _vecs(b), p_limbs)), FQ.add(a, b)
    )
    assert jnp.array_equal(
        _stack(mod_sub_vecs(_vecs(a), _vecs(b), p_limbs)), FQ.sub(a, b)
    )
    fifteen = FQ.const(15, batch_ndim=1)
    assert jnp.array_equal(
        _stack(_mul_by_3b(_vecs(a), p_limbs)),
        FQ.mul(a, jnp.broadcast_to(fifteen, a.shape)),
    )


def test_add_body_matches_vesta():
    n = 12
    p = _mixed_batch(n, seed=21)
    q = _mixed_batch(n, seed=22)
    p_limbs, n0inv = _fq_consts()
    X3, Y3, Z3 = _add_body(
        _vecs(p.x), _vecs(p.y), _vecs(p.z),
        _vecs(q.x), _vecs(q.y), _vecs(q.z),
        p_limbs, n0inv,
    )
    want = vesta.add(p, q)
    got = PointBatch(_stack(X3), _stack(Y3), _stack(Z3))
    for w, g in zip(want, got):
        assert jnp.array_equal(w, g)


def test_madd_body_matches_vesta_mixed():
    """Mixed Algorithm 8 (kernel body AND jnp twin) vs the lifted
    Algorithm 7: group-equal for finite q, including identity acc and
    doubling/cancellation cases."""
    from tinyram_tpu.curve.pallas_point import _madd_body

    finite = gen_points(6, seed=31)
    # acc: mix of identity, the same points (doubling), negations
    # (cancellation), and unrelated points
    acc_pts = [None, finite[1], (finite[2][0], (-finite[2][1]) % FQ.modulus),
               finite[4], None, finite[0]]
    acc = from_affine_host(acc_pts)
    q = from_affine_host(finite)
    p_limbs, n0inv = _fq_consts()
    X3, Y3, Z3 = _madd_body(
        _vecs(acc.x), _vecs(acc.y), _vecs(acc.z),
        _vecs(q.x), _vecs(q.y),
        p_limbs, n0inv,
    )
    got = PointBatch(_stack(X3), _stack(Y3), _stack(Z3))
    want = vesta.add(acc, q)
    assert bool(jnp.all(vesta.eq(got, want))), "kernel body != Alg 7"
    got2 = vesta.add_mixed(acc, q.x, q.y)
    assert bool(jnp.all(vesta.eq(got2, want))), "jnp twin != Alg 7"
    # twin and kernel body are bit-identical (same formula order)
    for w, g in zip(got2, got):
        assert jnp.array_equal(w, g)


class _FakeRef:
    """Minimal Ref stand-in: kernels read r[i] and write r[i] = v."""

    def __init__(self, arr=None, n=None):
        self.rows = [None] * N_LIMBS if arr is None else [arr[i] for i in range(N_LIMBS)]

    def __getitem__(self, idx):
        i = idx[0] if isinstance(idx, tuple) else idx
        return self.rows[i]

    def __setitem__(self, idx, v):
        i = idx[0] if isinstance(idx, tuple) else idx
        self.rows[i] = v

    def stacked(self):
        return jnp.stack(self.rows)


def test_pdouble_kernel_matches_vesta():
    n = 8
    p = _mixed_batch(n, seed=41)
    ox, oy, oz = _FakeRef(), _FakeRef(), _FakeRef()
    _pdouble_kernel(_FakeRef(p.x), _FakeRef(p.y), _FakeRef(p.z), ox, oy, oz)
    want = vesta.double(p)
    got = PointBatch(ox.stacked(), oy.stacked(), oz.stacked())
    for w, g in zip(want, got):
        assert jnp.array_equal(w, g)
