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


@pytest.mark.slow
def test_real_slab_programs_stay_sharded_k12(mesh):
    """The ACTUAL jitted quotient slab programs keep row sharding at a
    non-toy size (VERDICT r3 item 6: the r3 evidence checked a stand-in
    fold, not `_gate_fold_fns`/`_aux_fold_fns`).  Runs the real TinyRAM
    constraint system's first gate slab and first aux folds at k=12 under
    the 8-device mesh and asserts each OUTPUT is block-sharded with
    n_ext/D rows per device — the memory argument for k=18+ quotients.
    """
    import jax.numpy as jnp

    from tinyram_tpu.plonk.prover import _aux_fold_fns, _gate_fold_fns
    from tinyram_tpu.poly.domain import Domain
    from tinyram_tpu.shard.context import mesh_context
    from tinyram_tpu.tinyram import TinyRamCircuit

    cs = TinyRamCircuit(16, 8).tcs.cs
    k, ext_k = 12, 15
    dom = Domain(FP, k, ext_k)
    n, scale = 1 << k, 1 << (ext_k - k)
    rng = np.random.default_rng(7)

    def rand_cols(count):
        limbs = rng.integers(0, 1 << 16, size=(16, count, n)).astype(
            np.uint32
        )
        limbs[15] &= 0x3FFF
        return jnp.asarray(limbs)

    D = mesh.devices.size

    def assert_row_sharded(arr, what):
        spec = getattr(arr.sharding, "spec", None)
        assert spec is not None and "chips" in tuple(spec), (
            f"{what} not sharded: {arr.sharding}"
        )
        shard = next(iter(arr.addressable_shards))
        assert shard.data.shape[-1] == arr.shape[-1] // D, (
            f"{what}: shard holds {shard.data.shape[-1]} rows, "
            f"want {arr.shape[-1] // D}"
        )

    with mesh_context(mesh):
        # gate slabs: run the first (the widest — temp-var routing gates)
        fn, vars_, n_slab = _gate_fold_fns(cs, dom, scale, 48)[0]
        # coefficient inputs arrive via the sharded NTT in create_proof;
        # reproduce that (the all-to-all NTT's out_specs block-shard rows)
        stack = dom.lagrange_to_coeff(rand_cols(len(vars_)))
        w = FP.encode([1] * n_slab)[:, :, None]
        out = fn(stack, w)
        assert out.shape == (16, dom.n_ext)
        assert_row_sharded(out, f"gate slab 0 ({len(vars_)} cols)")

        # aux folds: one plookup and the LogUp argument
        aux = _aux_fold_fns(cs, dom, scale)
        tables3 = jnp.stack(
            [dom.coeff_to_extended(dom.lagrange_to_coeff(rand_cols(1)[:, 0]))]
            * 3,
            axis=1,
        )
        if aux["lookup"]:
            lfn, lvars = aux["lookup"][0]
            qstack = dom.lagrange_to_coeff(rand_cols(len(lvars)))
            astack = dom.lagrange_to_coeff(rand_cols(3))
            ch = FP.encode([3, 5, 7])[:, :, None]
            lout = lfn(qstack, astack, tables3, ch, FP.encode([1] * 5)[:, :, None])
            assert_row_sharded(lout, "plookup fold")
        if aux["range"]:
            rfn, rvars = aux["range"][0]
            rl = cs.range_lookups[0]
            nb = len(rl.batches())
            qstack = dom.lagrange_to_coeff(rand_cols(len(rvars)))
            astack = dom.lagrange_to_coeff(rand_cols(3 + nb))
            beta = FP.encode([9])[:, :1]
            rout = rfn(
                qstack, astack, tables3, beta,
                FP.encode([1] * (4 + nb))[:, :, None],
            )
            assert_row_sharded(rout, "LogUp fold")


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
