"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Sharded kernels must agree exactly with their single-chip counterparts
(SURVEY.md §4: "multi-chip tests that compare sharded vs single-chip
kernel outputs exactly").
"""

import random

import jax
import numpy as np
import pytest

from tinyram_tpu.curve import PointBatch, from_affine_host, host, to_affine_host
from tinyram_tpu.curve.msm import msm
from tinyram_tpu.field import FP
from tinyram_tpu.poly import ntt
from tinyram_tpu.shard import make_mesh, msm_sharded, ntt_sharded


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


@pytest.mark.parametrize("log_n", [6, 8])
def test_ntt_sharded_matches_single(mesh, log_n):
    rng = random.Random(100 + log_n)
    n = 1 << log_n
    vals = [rng.randrange(FP.modulus) for _ in range(n)]
    a = FP.encode(vals)
    want = FP.decode(ntt(FP, a))
    got = FP.decode(ntt_sharded(mesh, a))
    assert got == want


def test_intt_sharded_roundtrip(mesh):
    rng = random.Random(200)
    n = 256
    vals = [rng.randrange(FP.modulus) for _ in range(n)]
    a = FP.encode(vals)
    back = FP.decode(ntt_sharded(mesh, ntt_sharded(mesh, a), inverse=True))
    assert back == vals


@pytest.mark.slow
def test_msm_sharded_matches_single(mesh):
    from tests.test_curve import gen_points

    n = 32
    pts = gen_points(n, seed=300)
    rng = random.Random(301)
    scalars = [rng.randrange(FP.modulus) for _ in range(n)]
    sc = FP.encode(scalars, to_mont=False)
    pb = from_affine_host(pts)
    want = to_affine_host(
        PointBatch(*[c[:, None] for c in msm(sc, pb)])
    )[0]
    got_pb = msm_sharded(mesh, sc, pb)
    got = to_affine_host(PointBatch(*[c[:, None] for c in got_pb]))[0]
    assert got == want


@pytest.mark.slow
def test_scaling_report_smoke(mesh):
    """The 1→D scaling harness runs and reports sane efficiency numbers."""
    from tinyram_tpu.shard.scaling import scaling_report

    rep = scaling_report(log_n_ntt=8, log_n_msm=6, device_counts=[1, 8])
    assert set(rep["ntt"]) == {1, 8} and set(rep["msm"]) == {1, 8}
    assert all(v > 0 for v in rep["ntt"].values())
    assert all(v > 0 for v in rep["msm"].values())
    assert rep["efficiency"]["ntt"][1] == 1.0


def test_quotient_phase_sharding_propagates(mesh):
    """Memory argument for k=18+ quotient evaluation on a real mesh
    (VERDICT r2 item 6): in mesh mode the extended-coset columns come out
    of the all-to-all 4-step NTT BLOCK-SHARDED on the row axis, and the
    elementwise constraint fold keeps that sharding — so per-device HBM for
    the quotient phase is n_ext/D per column, not n_ext (replication).
    """
    from tinyram_tpu.poly.domain import Domain
    from tinyram_tpu.shard.context import mesh_context

    k, ext_k = 6, 8
    dom = Domain(FP, k, ext_k)
    rng = random.Random(42)
    col = FP.encode([rng.randrange(FP.modulus) for _ in range(1 << k)])

    with mesh_context(mesh):
        coeff = dom.lagrange_to_coeff(col)
        ext = dom.coeff_to_extended(coeff)

    def row_shards(arr):
        spec = getattr(arr.sharding, "spec", None)
        return spec is not None and "chips" in tuple(spec)

    assert row_shards(ext), f"extended column not sharded: {ext.sharding}"
    # one device holds 1/D of the rows, not a full copy
    shard = next(iter(ext.addressable_shards))
    assert shard.data.shape[-1] == ext.shape[-1] // mesh.devices.size

    # elementwise gate math preserves the sharding (XLA computation
    # follows sharding; no implicit all-gather back to one device)
    prod = FP.mul(ext, FP.add(ext, ext))
    assert row_shards(prod), f"gate eval gathered: {prod.sharding}"

    # and a jitted slab-fold-style program keeps it sharded too
    @jax.jit
    def fold(x):
        import jax.numpy as jnp

        nxt = jnp.roll(x, -4, axis=-1)  # Rotation::next at scale 4
        return FP.mul(x, FP.add(nxt, x))

    out = fold(ext)
    assert row_shards(out), f"jitted fold gathered: {out.sharding}"
