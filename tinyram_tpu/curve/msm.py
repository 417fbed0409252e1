"""Pippenger multi-scalar multiplication on TPU.

Replaces the fork's CPU Pippenger (SURVEY.md §2, native-component ledger)
with a formulation built from primitives XLA compiles well:

  1. 8-bit windowed digits extracted straight from the 16-bit limb arrays
     (two digits per limb, no bit twiddling across lanes).
  2. Per window: `argsort` points by digit, then a **segmented
     `associative_scan`** whose combiner is the complete projective add —
     completeness (RCB16) makes the operator total and associative, so the
     scan is mathematically exact for any bracketing.
  3. Segment sums land in buckets via an integer `segment_sum` over the raw
     limbs (exactly one contributing row per bucket, so integer addition is
     exact).
  4. Bucket-weighted reduction Σ d·B_d runs as a running-suffix loop
     vectorized across all 32 windows at once; final window combination is
     Horner with 8 doublings per step.

The multi-chip story (points sharded across devices, per-chip partial
buckets combined with `psum`-style tree adds) lives in shard/msm.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field.jfield import FQ
from ..field.params import N_LIMBS
from . import vesta
from .vesta import PointBatch

WINDOW_BITS = 8
N_WINDOWS = 32  # 256 bits / 8


def scalar_digits(scalars_plain: jnp.ndarray) -> jnp.ndarray:
    """(16, N) plain (non-Montgomery) scalar limbs -> (32, N) uint32 digits."""
    lo = scalars_plain & np.uint32(0xFF)
    hi = (scalars_plain >> np.uint32(8)) & np.uint32(0xFF)
    # window 2k   = low byte of limb k, window 2k+1 = high byte
    return jnp.stack([lo, hi], axis=1).reshape(2 * N_LIMBS, -1)


def _seg_combine(a, b):
    """Segmented-scan operator; flag marks 'starts a new segment'."""
    a_flag, ax, ay, az = a
    b_flag, bx, by, bz = b
    summed = vesta.add(PointBatch(ax, ay, az), PointBatch(bx, by, bz))
    keep_b = b_flag[0].astype(bool)  # flag is (1, n)
    out = vesta.select(keep_b, PointBatch(bx, by, bz), summed)
    return (a_flag | b_flag, out.x, out.y, out.z)


@jax.jit
def window_bucket_sums(digits: jnp.ndarray, points: PointBatch) -> PointBatch:
    """Bucket sums for one window: returns PointBatch with batch (257,).

    Bucket 256 is the spill bucket for non-segment-end rows; buckets for
    digits that never occur hold the identity.
    """
    n = digits.shape[0]
    order = jnp.argsort(digits)
    d_sorted = jnp.take(digits, order, axis=0)
    px = jnp.take(points.x, order, axis=-1)
    py = jnp.take(points.y, order, axis=-1)
    pz = jnp.take(points.z, order, axis=-1)

    starts = jnp.concatenate(
        [jnp.ones((1,), jnp.uint32), (d_sorted[1:] != d_sorted[:-1]).astype(jnp.uint32)]
    )[None, :]  # (1, n): all scan leaves rank-2 with the scan axis last
    if n <= 1024:
        # sequential scan: `associative_scan` unrolls ~2n complete-adds into
        # the graph (minutes of XLA compile); a lax.scan body is one add and
        # compiles instantly.  Runtime is n serial steps — fine at test
        # sizes, while big-N MSMs take the log-depth path below.
        def step(carry, inp):
            flag, x, y, z = inp
            cur = PointBatch(x, y, z)
            summed = vesta.add(carry, cur)
            out = vesta.select(flag.astype(bool)[0], cur, summed)
            return out, out

        inputs = (
            jnp.moveaxis(starts, -1, 0),
            jnp.moveaxis(px, -1, 0),
            jnp.moveaxis(py, -1, 0),
            jnp.moveaxis(pz, -1, 0),
        )
        _, outs = jax.lax.scan(step, vesta.identity(()), inputs)
        sx = jnp.moveaxis(outs.x, 0, -1)
        sy = jnp.moveaxis(outs.y, 0, -1)
        sz = jnp.moveaxis(outs.z, 0, -1)
    else:
        flags, sx, sy, sz = jax.lax.associative_scan(
            _seg_combine, (starts, px, py, pz), axis=-1
        )
        del flags
    ends = jnp.concatenate(
        [(d_sorted[1:] != d_sorted[:-1]), jnp.ones((1,), bool)]
    )
    ids = jnp.where(ends, d_sorted.astype(jnp.int32), 256)
    # exactly one contributing row per bucket -> integer scatter-add is exact
    def scatter(coord):
        return jax.ops.segment_sum(
            coord.T, ids, num_segments=257, indices_are_sorted=False
        ).T  # (16, 257)

    bx, by, bz = scatter(sx), scatter(sy), scatter(sz)
    # empty buckets came out all-zero; patch to the projective identity
    empty = jnp.all(jnp.concatenate([bx, by, bz], axis=0) == 0, axis=0)
    by = jnp.where(empty[None], FQ.ones((257,)), by)
    return PointBatch(bx, by, bz)


@jax.jit
def _weighted_bucket_reduce(buckets: PointBatch) -> PointBatch:
    """Σ_{d=1}^{255} d · B_d for all windows at once.

    buckets: PointBatch with batch shape (n_windows, 257).
    Returns PointBatch with batch shape (n_windows,).
    """
    nw = buckets.x.shape[1]
    acc0 = vesta.identity((nw,))
    tot0 = vesta.identity((nw,))

    def body(i, carry):
        acc, tot = carry
        d = 255 - i
        bd = PointBatch(
            jax.lax.dynamic_index_in_dim(buckets.x, d, axis=2, keepdims=False),
            jax.lax.dynamic_index_in_dim(buckets.y, d, axis=2, keepdims=False),
            jax.lax.dynamic_index_in_dim(buckets.z, d, axis=2, keepdims=False),
        )
        acc = vesta.add(acc, bd)
        tot = vesta.add(tot, acc)
        return (acc, tot)

    _, tot = jax.lax.fori_loop(0, 255, body, (acc0, tot0))
    return tot


@jax.jit
def _combine_windows(window_sums: PointBatch) -> PointBatch:
    """Horner combine: result = Σ_w 2^{8w} S_w; batch shape (n_windows,) -> ()."""
    nw = window_sums.x.shape[1]

    def body(i, acc):
        w = nw - 1 - i
        sw = PointBatch(
            jax.lax.dynamic_index_in_dim(window_sums.x, w, 1, keepdims=False),
            jax.lax.dynamic_index_in_dim(window_sums.y, w, 1, keepdims=False),
            jax.lax.dynamic_index_in_dim(window_sums.z, w, 1, keepdims=False),
        )
        def dbl(_, p):
            return vesta.double(p)
        acc = jax.lax.fori_loop(0, WINDOW_BITS, dbl, acc)
        return vesta.add(acc, sw)

    return jax.lax.fori_loop(0, nw, body, vesta.identity(()))


def msm(scalars_plain: jnp.ndarray, points: PointBatch) -> PointBatch:
    """Full Pippenger MSM.

    scalars_plain: (16, N) **plain-form** scalar limbs (use
    `FP.from_mont` first if coming from Montgomery-form field data).
    points: PointBatch with batch (N,).
    Returns a single projective point (batch ()).
    """
    digits = scalar_digits(scalars_plain)  # (32, N)
    per_window = [
        window_bucket_sums(digits[w], points) for w in range(N_WINDOWS)
    ]
    buckets = PointBatch(
        jnp.stack([b.x for b in per_window], axis=1),
        jnp.stack([b.y for b in per_window], axis=1),
        jnp.stack([b.z for b in per_window], axis=1),
    )  # batch (32, 257)
    window_sums = _weighted_bucket_reduce(buckets)
    return _combine_windows(window_sums)


@jax.jit
def _window_bucket_sums_batched(digits_b: jnp.ndarray, points: PointBatch):
    """vmap of window_bucket_sums over a leading batch axis of digit vectors.

    digits_b: (B, N) uint32 → PointBatch with batch (B, 257).
    """
    return jax.vmap(window_bucket_sums, in_axes=(0, None), out_axes=1)(
        digits_b, points
    )


def msm_many(scalars_plain: jnp.ndarray, points: PointBatch) -> PointBatch:
    """MSM of B scalar vectors against one point set in a single fused pass.

    scalars_plain: (16, B, N) plain-form scalar limbs.
    Returns a PointBatch with batch shape (B,).

    This is the workhorse for committing every advice/fixed/instance column
    of a PLONK circuit at once: all 32·B windows are bucketed in one
    compiled program instead of B sequential Pippenger runs.
    """
    _, B, N = scalars_plain.shape
    # digits: (32, B, N) -> flatten windows×batch for one vmapped pass
    lo = scalars_plain & np.uint32(0xFF)
    hi = (scalars_plain >> np.uint32(8)) & np.uint32(0xFF)
    digits = jnp.stack([lo, hi], axis=1).reshape(2 * N_LIMBS, B, N)
    digits_flat = digits.reshape(N_WINDOWS * B, N)
    buckets_flat = _window_bucket_sums_batched(digits_flat, points)
    # (16, 32*B, 257) -> regroup to per-column windows
    bx = buckets_flat.x.reshape(16, N_WINDOWS, B, 257)
    by = buckets_flat.y.reshape(16, N_WINDOWS, B, 257)
    bz = buckets_flat.z.reshape(16, N_WINDOWS, B, 257)
    # weighted bucket reduction vectorized over (windows × columns)
    buckets = PointBatch(
        bx.reshape(16, N_WINDOWS * B, 257),
        by.reshape(16, N_WINDOWS * B, 257),
        bz.reshape(16, N_WINDOWS * B, 257),
    )
    wsums = _weighted_bucket_reduce(buckets)  # batch (32*B,)
    per_col = PointBatch(
        wsums.x.reshape(16, N_WINDOWS, B),
        wsums.y.reshape(16, N_WINDOWS, B),
        wsums.z.reshape(16, N_WINDOWS, B),
    )
    return _combine_windows_batched(per_col)


@jax.jit
def _combine_windows_batched(window_sums: PointBatch) -> PointBatch:
    """Horner window combine for (n_windows, B) batches -> (B,)."""
    nw = window_sums.x.shape[1]
    B = window_sums.x.shape[2]

    def body(i, acc):
        w = nw - 1 - i
        sw = PointBatch(
            jax.lax.dynamic_index_in_dim(window_sums.x, w, 1, keepdims=False),
            jax.lax.dynamic_index_in_dim(window_sums.y, w, 1, keepdims=False),
            jax.lax.dynamic_index_in_dim(window_sums.z, w, 1, keepdims=False),
        )

        def dbl(_, p):
            return vesta.double(p)

        acc = jax.lax.fori_loop(0, WINDOW_BITS, dbl, acc)
        return vesta.add(acc, sw)

    return jax.lax.fori_loop(0, nw, body, vesta.identity((B,)))
