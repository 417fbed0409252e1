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


def _shift_right(arr: jnp.ndarray, d: int, fill: jnp.ndarray) -> jnp.ndarray:
    """arr[i-d] along the last axis, first d lanes filled from `fill`."""
    return jnp.concatenate([fill[..., :d], arr[..., :-d]], axis=-1)


def _segmented_sums(d_sorted: jnp.ndarray, pts: PointBatch) -> PointBatch:
    """Inclusive segmented prefix point-sums over digit-sorted lanes.

    Hillis–Steele distance doubling: log2(n) rounds, each one full-width
    complete add + select.  (An `associative_scan` with the 3k-op point-add
    combiner unrolls ~2n bodies — minutes of XLA compile; a `lax.scan` is
    serial — ~ms per step through this stack.  log-depth × full-width is
    the TPU-shaped middle.)  Segment *ends* hold the full segment sums.
    """
    n = d_sorted.shape[-1]
    ident = vesta.identity((n,))
    x = pts
    d = 1
    while d < n:
        same = jnp.concatenate(
            [jnp.zeros((d,), bool), d_sorted[d:] == d_sorted[:-d]]
        )
        shifted = PointBatch(
            _shift_right(x.x, d, ident.x),
            _shift_right(x.y, d, ident.y),
            _shift_right(x.z, d, ident.z),
        )
        summed = vesta.add(x, shifted)
        x = vesta.select(same, summed, x)
        d *= 2
    return x


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

    sums = _segmented_sums(d_sorted, PointBatch(px, py, pz))
    sx, sy, sz = sums.x, sums.y, sums.z
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
    """Σ_{d=1}^{255} d · B_d for all windows at once (log-depth).

    Σ d·B_d = Σ_{d≥1} S_d with S_d = Σ_{e≥d} B_e: an 8-round suffix
    point-sum over the bucket axis followed by an 8-round pairwise tree
    reduction — 16 full-width adds instead of 510 serial ones.

    buckets: PointBatch with batch shape (n_windows, 257) (bucket 256 is
    the spill bucket and is excluded).  Returns batch (n_windows,).
    """
    nw = buckets.x.shape[1]
    # drop spill bucket and bucket 0 (weight 0): work on buckets 1..255,
    # padded to 256 lanes with identity at the END (suffix sums unaffected)
    ident_col = vesta.identity((nw, 1))

    def prep(c, ic):
        return jnp.concatenate([c[..., 1:256], ic], axis=-1)  # (16, nw, 256)

    x = PointBatch(
        prep(buckets.x, ident_col.x),
        prep(buckets.y, ident_col.y),
        prep(buckets.z, ident_col.z),
    )
    # suffix inclusive sums via distance doubling toward the left
    d = 1
    ident = vesta.identity((nw, 256))
    while d < 256:
        shifted = PointBatch(
            jnp.concatenate([x.x[..., d:], ident.x[..., :d]], axis=-1),
            jnp.concatenate([x.y[..., d:], ident.y[..., :d]], axis=-1),
            jnp.concatenate([x.z[..., d:], ident.z[..., :d]], axis=-1),
        )
        x = vesta.add(x, shifted)
        d *= 2
    # now lane j holds S_{j+1} = Σ_{e ≥ j+1} B_e; total = Σ_j lane_j
    while x.x.shape[-1] > 1:
        h = x.x.shape[-1] // 2
        x = vesta.add(
            PointBatch(x.x[..., :h], x.y[..., :h], x.z[..., :h]),
            PointBatch(x.x[..., h:], x.y[..., h:], x.z[..., h:]),
        )
    return PointBatch(x.x[..., 0], x.y[..., 0], x.z[..., 0])


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
