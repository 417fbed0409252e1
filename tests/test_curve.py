"""Vesta curve + MSM tests against the host-int oracle."""

import random

import numpy as np
import pytest

from tinyram_tpu.curve import (
    PointBatch,
    add,
    double,
    eq,
    from_affine_host,
    host,
    identity,
    msm,
    neg,
    scalar_mul,
    to_affine_host,
)
from tinyram_tpu.field import FP, FQ
from tinyram_tpu.field.params import CURVE_B, Q_VESTA_BASE


def gen_points(n, seed=0):
    """Deterministic pseudo-random affine Vesta points (host search)."""
    rng = random.Random(seed)
    q = Q_VESTA_BASE
    pts = []
    while len(pts) < n:
        x = rng.randrange(q)
        rhs = (x * x * x + CURVE_B) % q
        # Tonelli–Shanks via sqrt for q ≡ 1 mod 4: use pow with (q+2^32... )
        # simplest: check Euler criterion then find sqrt by generic alg.
        if pow(rhs, (q - 1) // 2, q) != 1:
            continue
        y = _sqrt_mod(rhs, q)
        assert y * y % q == rhs
        pts.append((x, y))
    return pts


def _sqrt_mod(a, p):
    """Tonelli–Shanks (p ≡ 1 mod 2^32 for pasta)."""
    if a == 0:
        return 0
    s, t = 0, p - 1
    while t % 2 == 0:
        s += 1
        t //= 2
    z = 5  # known non-residue (the generator)
    m, c, tt, r = s, pow(z, t, p), pow(a, t, p), pow(a, (t + 1) // 2, p)
    while tt != 1:
        i, tmp = 0, tt
        while tmp != 1:
            tmp = tmp * tmp % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        tt, r = tt * c % p, r * b % p
    return r


def test_host_points_on_curve():
    for pt in gen_points(4, seed=1):
        assert host.is_on_curve(pt)


def test_device_add_matches_host():
    pts = gen_points(8, seed=2)
    p = from_affine_host(pts[:4])
    q = from_affine_host(pts[4:])
    got = to_affine_host(add(p, q))
    want = [host.add(a, b) for a, b in zip(pts[:4], pts[4:])]
    assert got == want


def test_device_add_complete_cases():
    pts = gen_points(2, seed=3)
    p = from_affine_host([pts[0], pts[0], pts[0], None, None])
    q = from_affine_host([pts[0], host.neg(pts[0]), None, pts[1], None])
    got = to_affine_host(add(p, q))
    assert got[0] == host.add(pts[0], pts[0])  # doubling through add
    assert got[1] is None                      # P + (-P)
    assert got[2] == pts[0]                    # P + O
    assert got[3] == pts[1]                    # O + Q
    assert got[4] is None                      # O + O


def test_device_double_matches_host():
    pts = gen_points(3, seed=4)
    got = to_affine_host(double(from_affine_host(pts + [None])))
    assert got == [host.add(p, p) for p in pts] + [None]


def test_scalar_mul_matches_host():
    import jax.numpy as jnp

    pts = gen_points(2, seed=5)
    rng = random.Random(6)
    ks = [rng.randrange(FP.modulus) for _ in pts]
    bits = np.array(
        [[(k >> (254 - i)) & 1 for k in ks] for i in range(255)], dtype=np.uint32
    )
    got = to_affine_host(scalar_mul(jnp.asarray(bits), from_affine_host(pts)))
    want = [host.scalar_mul(k, p) for k, p in zip(ks, pts)]
    assert got == want


@pytest.mark.parametrize(
    "n", [1, 5, pytest.param(64, marks=pytest.mark.slow)]
)
def test_msm_matches_host(n):
    pts = gen_points(n, seed=7 + n)
    rng = random.Random(8 + n)
    scalars = [rng.randrange(FP.modulus) for _ in range(n)]
    # include edge scalars
    if n >= 5:
        scalars[0] = 0
        scalars[1] = 1
        scalars[2] = FP.modulus - 1
    sc = FP.encode(scalars, to_mont=False)
    got = to_affine_host(
        PointBatch(*[c[:, None] for c in msm(sc, from_affine_host(pts))])
    )[0]
    want = host.msm(scalars, pts)
    assert got == want


@pytest.mark.slow
@pytest.mark.parametrize(
    "c,affine", [(8, False), (11, False), (8, True)],
    ids=["c8", "c11", "c8-affine"],
)
def test_pippenger_signed_matches_host(c, affine):
    """Exercise the signed-digit Pippenger path directly (the public msm()
    routes small N to the bit-serial path; real sizes hit this pipeline).
    The affine variant covers the opt-in batched-affine bucket scan
    (TINYRAM_MSM_AFFINE=1; shared product-tree inversion per scan step)."""
    import jax.numpy as jnp

    from tinyram_tpu.curve.msm import _msm_call, _msm_many_call

    n = 128
    pts = gen_points(n, seed=31)
    pts[5] = None  # identity inputs must be routed to the spill bucket
    pts[70] = None  # (the r4 mixed-add scan requires finite q operands)
    rng = random.Random(32)
    scalars = [rng.randrange(FP.modulus) for _ in range(n)]
    scalars[:3] = [0, 1, FP.modulus - 1]
    sc = FP.encode(scalars, to_mont=False)
    got = to_affine_host(
        PointBatch(
            *[x[:, None]
              for x in _msm_call(sc, from_affine_host(pts), c, affine)]
        )
    )[0]
    assert got == host.msm(scalars, pts)

    # batched variant: 2 scalar vectors against the same points
    scalars2 = [rng.randrange(FP.modulus) for _ in range(n)]
    sc2 = FP.encode(scalars2, to_mont=False)
    both = jnp.stack([sc, sc2], axis=1)
    got2 = to_affine_host(
        _msm_many_call(both, from_affine_host(pts), c, affine)
    )
    assert got2 == [host.msm(scalars, pts), host.msm(scalars2, pts)]
