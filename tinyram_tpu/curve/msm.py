"""Pippenger multi-scalar multiplication on TPU.

Replaces the fork's CPU Pippenger (SURVEY.md §2, native-component ledger)
with a formulation built from primitives XLA compiles well.  The pipeline
per scalar window:

  1. c-bit digits extracted straight from the 16-bit limb arrays.
  2. Points digit-sorted (one XLA sort per window group), then bucket
     sums via a **work-efficient chunked segmented scan**: the sorted lane
     axis is cut into chunks of length L; a `lax.scan` of L steps computes
     within-chunk segmented inclusive point-sums at full lane width (one
     complete RCB16 add per element total — O(N) work, unlike the previous
     Hillis–Steele pass which cost O(N log N) adds), and a log-width
     carry-fixup stitches segments that span chunk boundaries.
  3. Segment-end rows land in buckets via an integer `segment_sum` over
     the raw limbs (exactly one contributing row per bucket, so integer
     addition is exact).
  4. Bucket-weighted reduction Σ d·B_d splits d = hi·S + lo and runs a
     serial scan over the S lo-lanes at full (windows × hi) width — 2
     adds per bucket instead of log(buckets) — followed by log-depth
     combines over hi.
  5. Final window combination is Horner with c doublings per step.

The window size c adapts to N (8-bit at 2^12 up to 16-bit at 2^20+),
and windows are processed in groups sized to bound peak HBM use.

The multi-chip story (points sharded across devices, per-chip partial
buckets combined with `psum`-style tree adds) lives in shard/msm.py.
"""

from __future__ import annotations

import os

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field.jfield import FQ
from ..field.params import N_LIMBS
from . import vesta
from .vesta import PointBatch

SCALAR_BITS = 16 * N_LIMBS  # 256


def _ops():
    """(add, add_select, double) — fused Pallas kernels on TPU, jnp else.

    add_select(mask, p, q) = select(mask, p + q, q).  Resolved at trace
    time; the CPU test mesh exercises the jnp path and tests/test_pallas
    checks kernel-vs-jnp equality in interpret mode.
    """
    from . import pallas_point as pp

    if pp.use_pallas_points():
        return pp.padd, pp.padd_select, pp.pdouble
    return (
        vesta.add,
        lambda m, p, q: vesta.select(m, vesta.add(p, q), q),
        vesta.double,
    )


def _mixed_select():
    """fn(mask, acc, qx, qy) = select(mask, acc + (qx,qy,1), (qx,qy,1)).

    The bucket scan's inner op: q is affine (RCB16 Algorithm 8) so the
    scan gathers only 2 coordinates.  Identity q is NOT handled — the
    caller routes identity inputs to the spill bucket first."""
    from . import pallas_point as pp

    if pp.use_pallas_points():
        return pp.padd_select_mixed

    def jnp_mixed(mask, acc, qx, qy):
        lifted = PointBatch(qx, qy, FQ.ones(qx.shape[1:]))
        return vesta.select(mask, vesta.add_mixed(acc, qx, qy), lifted)

    return jnp_mixed

# Peak per-group element budget: a group materializes ~3x (sorted points,
# scan outputs, gathers) x 192 B/point, so 2^22 elements ~= 2.5 GB peak.
# Tunable for A/B on chip (scripts/tune_msm_window.py).  Read lazily so
# setting TINYRAM_MSM_GROUP_LOG2 / TINYRAM_MSM_LANES_LOG2 after import
# still takes effect (ADVICE r4); the values join _plan's cache key.
def _group_elems() -> int:
    return 1 << int(os.environ.get("TINYRAM_MSM_GROUP_LOG2", "22"))


# Total lanes per scan step.  Wider = fewer serial scan steps, which also
# amortizes the affine scan's fixed per-step cost (tree levels + shared
# Fermat) — so the affine path defaults 4x wider (2^17 ≈ 8 MB/live array).
def _target_lanes() -> int:
    default = "17" if _affine_scan() else "15"
    return 1 << int(os.environ.get("TINYRAM_MSM_LANES_LOG2", default))


def _affine_scan() -> bool:
    """Opt-in batched-affine bucket scan (chip-measured slower than the
    fused-Pallas projective scan — see the note in
    _group_bucket_sums_inner); read per call and passed to the jitted
    pipeline as a static arg so toggling it retraces correctly."""
    return os.environ.get("TINYRAM_MSM_AFFINE", "0") != "0"


def choose_window_bits(n: int) -> int:
    """Minimize total adds: W(c) * (n + α·2^(c-1)); signed digits halve
    the bucket count (W = ceil(256/c)).  α = 0.4 fitted to the r4 chip
    sweep (logs/tune_msm_r4*.log: 2^16 optimum c=15 @491K pts/s, 2^20
    optimum c=16 @653K — the old α=2.2 under-windowed 2^16 by two bits,
    the r3 @2^16 regression)."""
    override = os.environ.get("TINYRAM_MSM_WINDOW")
    if override:
        # memory lever: W_total x 2^(c-1) bucket rows dominate peak HBM in
        # wide msm_many commits; a smaller c trades ~10-20% speed for a
        # multiple less bucket memory (config-3 k=17 commit OOM, r5)
        return int(override)
    best_c, best_cost = 8, None
    # bucket count capped at n/4 — past that the scatter/reduce fixed
    # costs cliff (measured: c=16 @2^16 runs at 0.62x of c=15)
    c_max = min(17, max(8, n.bit_length() - 2))
    for c in range(6, c_max + 1):
        w = -(-SCALAR_BITS // c)
        cost = w * (n + 0.4 * (1 << (c - 1)))
        if best_cost is None or cost < best_cost:
            best_c, best_cost = c, cost
    return best_c


def scalar_digits(scalars_plain: jnp.ndarray, c: int) -> jnp.ndarray:
    """(16, N) plain (non-Montgomery) scalar limbs -> (W, N) int32 digits.

    Window w covers scalar bits [w*c, w*c + c); digits < 2^c.
    """
    n_windows = -(-SCALAR_BITS // c)
    mask = np.uint32((1 << c) - 1)
    outs = []
    for w in range(n_windows):
        lo_bit = w * c
        i0, s = divmod(lo_bit, 16)
        if i0 >= N_LIMBS:
            outs.append(jnp.zeros_like(scalars_plain[0]))
            continue
        d = scalars_plain[i0] >> np.uint32(s)
        if s + c > 16 and i0 + 1 < N_LIMBS:
            d = d | (scalars_plain[i0 + 1] << np.uint32(16 - s))
        if s + c > 32 and i0 + 2 < N_LIMBS:
            d = d | (scalars_plain[i0 + 2] << np.uint32(32 - s))
        outs.append(d & mask)
    return jnp.stack(outs).astype(jnp.int32)


def signed_digits(scalars_plain: jnp.ndarray, c: int):
    """(16, ...) plain scalars -> (|d|, sign) with d ∈ [−2^(c−1), 2^(c−1)].

    Standard signed-digit recoding: d'_w = d_w + carry; if d'_w > 2^(c−1)
    subtract 2^c and carry 1 into window w+1.  Halves the bucket range of
    the Pippenger pipeline (bucket = |d|, the point is negated when d < 0).
    The top window never overflows: scalars are < p < 2^255 so its raw
    digit is ≤ 2^(c−1) − 1 even after a carry.
    """
    d = scalar_digits(scalars_plain, c)  # (W, ...) int32 in [0, 2^c)
    half = 1 << (c - 1)
    full = 1 << c

    def step(carry, dw):
        dw = dw + carry
        hi = dw > half
        out = jnp.where(hi, dw - full, dw)
        return hi.astype(jnp.int32), out

    _, out = jax.lax.scan(step, jnp.zeros_like(d[0]), d)
    return jnp.abs(out), out < 0


def _plan(n: int, n_windows: int):
    return _plan_impl(n, n_windows, _group_elems(), _target_lanes())


@lru_cache(maxsize=None)
def _plan_impl(n: int, n_windows: int, group_elems: int, target_lanes: int):
    """(group_size G, chunk length L, padded N) for the bucket pipeline."""
    g = max(1, min(n_windows, group_elems // max(n, 1)))
    # chunk lanes across the whole group: aim for target_lanes total.
    # Round lanes to a multiple of 128 (full vreg rows) instead of a power
    # of two — the old pow2 rounding ran e.g. 2^16/c=13 at 1024 of a 1638
    # lane budget (62%), inflating the serial step count (r4, VERDICT r3
    # weak #3).
    k_per_window = max(1, target_lanes // g)
    cap = min(k_per_window, max(1, n // 8))
    if cap >= 128:
        lanes = (cap // 128) * 128
    else:
        lanes = 1
        while lanes * 2 <= cap:
            lanes *= 2
    n_pad = -(-n // lanes) * lanes
    L = n_pad // lanes
    return g, lanes, L, n_pad


def _shift_lanes(coord: jnp.ndarray, d: int, fill: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([fill[..., :d], coord[..., :-d]], axis=-1)


def _fermat_unrolled(a: jnp.ndarray) -> jnp.ndarray:
    """a^(p-2) via a block-unrolled square-and-multiply ladder.

    The ladder is inherently ~255 serial muls; at the product-tree root
    (width 256) each mul is ~1-2 µs of VPU work, so the cost driver is
    LOOP OVERHEAD, not arithmetic — the compact fori_loop spent ~8 ms per
    scan step (chip: MSM @2^20 regressed 647K -> 148K pts/s,
    logs/bench_msm_r5.log).  unroll=32 keeps the HLO small enough to
    compile while cutting the per-iteration overhead 32x.  A fully
    unrolled chain (382 muls inline, ~57K HLO ops inside the scan body)
    was tried first and made compilation intractable.  inv(0) = 0."""
    bits = np.array(
        [int(b) for b in bin(FQ.modulus - 2)[2:]], dtype=np.int32
    )
    bits_d = jnp.asarray(bits)

    def body(i, acc):
        acc = FQ.mul(acc, acc)
        with_mul = FQ.mul(acc, a)
        take = (bits_d[i] == 1).reshape((1,) * acc.ndim)
        return jnp.where(take, with_mul, acc)

    from ..field.params import N_LIMBS as _NL

    acc0 = jnp.broadcast_to(
        jnp.asarray(FQ._r).reshape((_NL,) + (1,) * (a.ndim - 1)), a.shape
    ).astype(jnp.uint32)
    return jax.lax.fori_loop(0, len(bits), body, acc0, unroll=32)


def batch_inv(d: jnp.ndarray, stop_width: int = 256) -> jnp.ndarray:
    """Batched modular inverse over the last axis via a product tree.

    Montgomery's simultaneous-inversion trick, restructured for a vector
    machine: the serial prefix-product becomes a log-depth pairing tree
    (up-sweep ~1 mul/lane of work), ONE vectorized Fermat exponentiation at
    `stop_width` (255 serial squarings cost the same wall-clock at width
    256 as at width 1), then a down-sweep (inv_left = inv_parent · right,
    inv_right = inv_parent · left; ~2 muls/lane).  Total ~3 muls/lane +
    one shared inversion — the "one shared Montgomery inversion per scan
    step across lanes" lever for batched-affine bucket accumulation.

    Zero inputs poison their whole subtree product: callers must
    pre-substitute zeros with one (the MSM scan routes those lanes to the
    spill bucket, so their garbage inverses are never observed).
    """
    levels = []  # (left, right, width_before_padding)
    cur = d
    while cur.shape[-1] > stop_width:
        n = cur.shape[-1]
        if n % 2:
            cur = jnp.concatenate(
                [cur, FQ.ones(cur.shape[1:-1] + (1,))], axis=-1
            )
        left, right = cur[..., 0::2], cur[..., 1::2]
        levels.append((left, right, n))
        cur = FQ.mul(left, right)
    inv = _fermat_unrolled(cur)
    for left, right, n in reversed(levels):
        inv_left = FQ.mul(inv, right)
        inv_right = FQ.mul(inv, left)
        w = left.shape[-1]
        inv = jnp.stack([inv_left, inv_right], axis=-1).reshape(
            left.shape[:-1] + (2 * w,)
        )[..., :n]
    return inv


def _group_bucket_sums_inner(
    digits_g: jnp.ndarray,  # (G, N) int32 bucket ids (|d| for signed)
    signs_g: jnp.ndarray,  # (G, N) bool: negate the point in this window
    points: PointBatch,  # batch (N,)
    c: int,
    lanes_per_window: int,
    L: int,
    n_buckets: int,
    affine: bool = False,
) -> PointBatch:
    """Bucket sums for G digit vectors at once -> batch (G, n_buckets + 1).

    Slot n_buckets is the spill bucket (non-segment-end rows + padding).
    Signed-digit recoding: signs_g marks lanes whose point enters its
    window's bucket negated (y -> -y).
    """
    spill = n_buckets
    G, n = digits_g.shape
    n_pad = lanes_per_window * L
    # identity inputs (z = 0) contribute nothing: route them to the spill
    # bucket so the mixed-add scan below never sees a non-finite q
    # (RCB16 Algorithm 8 requires finite P2; padding rows get the same
    # treatment via the pad constant)
    ident_in = FQ.is_zero(points.z)  # (n,)
    digits_g = jnp.where(ident_in[None, :], spill, digits_g)
    if n_pad != n:
        digits_g = jnp.pad(digits_g, ((0, 0), (0, n_pad - n)),
                           constant_values=spill)
        signs_g = jnp.pad(signs_g, ((0, 0), (0, n_pad - n)))
        zero = FQ.zeros((n_pad - n,))
        points = PointBatch(
            jnp.concatenate([points.x, zero], axis=-1),
            jnp.concatenate([points.y, zero], axis=-1),
            points.z,  # unused below
        )

    order = jnp.argsort(digits_g, axis=-1)  # (G, n_pad)
    d_sorted = jnp.take_along_axis(digits_g, order, axis=-1)
    s_sorted = jnp.take_along_axis(signs_g, order, axis=-1)
    # Minor-axis gathers: measured 44 ms/coord @2^20 on the chip.  A
    # row-major (n, 48)-table gather with contiguous 192-byte rows was
    # tried (round 3) and is 2x SLOWER end-to-end (249 ms for 3 coords;
    # the transposes dominate) — XLA's TPU gather already vectorizes the
    # shared index pattern across the 16 limb rows.  Round 4: the mixed
    # Algorithm-8 scan consumes q affine, so Z is never gathered at all
    # (1/3 of the gather traffic gone).
    px = jnp.take(points.x, order, axis=-1)  # (16, G, n_pad)
    py = jnp.take(points.y, order, axis=-1)
    py = jnp.where(s_sorted[None], FQ.neg(py), py)

    # global segment ends (computed before chunking)
    ends = jnp.concatenate(
        [d_sorted[:, 1:] != d_sorted[:, :-1], jnp.ones((G, 1), bool)], axis=-1
    )

    M = G * lanes_per_window  # total chunk lanes
    d_chunk = d_sorted.reshape(M, L)
    # scan inputs, step axis first
    sx = jnp.moveaxis(px.reshape(N_LIMBS, M, L), -1, 0)  # (L, 16, M)
    sy = jnp.moveaxis(py.reshape(N_LIMBS, M, L), -1, 0)
    same = jnp.concatenate(
        [jnp.zeros((M, 1), bool), d_chunk[:, 1:] == d_chunk[:, :-1]], axis=-1
    ).T  # (L, M)

    _padd, _psel, _pdbl = _ops()

    # Batched-affine scan: chip-verified correct but measured SLOWER than
    # the projective scan on this hardware (2^20: 257K vs 647K pts/s,
    # logs/bench_msm_r5c.log) — the fused Pallas mixed-add runs its 11
    # muls in ONE VMEM-resident kernel, while the affine step's ~7 muls +
    # shared-inversion tree emit ~30 separate XLA fusions that round-trip
    # HBM every scan step, plus a ms-scale serial Fermat stall per step.
    # Kept opt-in (TINYRAM_MSM_AFFINE=1) as the documented experiment; the
    # win would need the whole affine step fused into a single kernel.
    if affine:
        # ---- batched-affine segmented scan (round 5).  The accumulator
        # stays AFFINE (x, y, inf-flag): a λ-based affine add is 4 muls +
        # ~3 muls of shared batch_inv tree ≈ 7 muls/lane/step vs the 11-mul
        # projective mixed add (RCB16 Alg 8).  The λ denominators are
        # independent across the M lanes, so one product tree + one
        # vectorized Fermat per scan step serves every lane.  Case split:
        #   restart (segment start) or inf acc  -> take q
        #   x equal, y equal                    -> doubling (λ = 3x²/2y)
        #   x equal, y differs (so y = −y')     -> cancel -> identity
        #   else                                -> chord   (λ = Δy/Δx)
        # Zero denominators only arise on garbage lanes (the (0,0) padding
        # points route to the spill bucket); they are substituted with one
        # so they cannot poison the shared product tree.
        one_m = FQ.ones((M,))

        def step(carry, inp):
            ax, ay, inf = carry
            s, cx, cy = inp
            x_eq = FQ.eq(ax, cx)
            y_eq = FQ.eq(ay, cy)
            dbl = jnp.logical_and(x_eq, y_eq)
            cancel = jnp.logical_and(x_eq, ~y_eq)
            ax2 = FQ.mul(ax, ax)
            numer = FQ.select(
                dbl, FQ.add(FQ.double(ax2), ax2), FQ.sub(cy, ay)
            )
            denom = FQ.select(dbl, FQ.double(ay), FQ.sub(cx, ax))
            active = jnp.logical_and(s, jnp.logical_and(~inf, ~cancel))
            safe = jnp.logical_and(active, ~FQ.is_zero(denom))
            denom = FQ.select(safe, denom, one_m)
            lam = FQ.mul(numer, batch_inv(denom))
            x3 = FQ.sub(FQ.sub(FQ.mul(lam, lam), ax), cx)
            y3 = FQ.sub(FQ.mul(lam, FQ.sub(ax, x3)), ay)
            takes_q = jnp.logical_or(~s, inf)
            nx = FQ.select(takes_q, cx, x3)
            ny = FQ.select(takes_q, cy, y3)
            ninf = jnp.logical_and(
                s, jnp.logical_and(~inf, cancel)
            )
            # identity lanes must carry the canonical (0 : 1 : 0) rep —
            # the projective carry-fixup/bucket adds downstream assume
            # on-curve inputs, and (garbage_x : garbage_y : 0) is not one
            nx = FQ.select(ninf, FQ.zeros((M,)), nx)
            ny = FQ.select(ninf, one_m, ny)
            return (nx, ny, ninf), (nx, ny, ninf)

        init = (FQ.zeros((M,)), FQ.zeros((M,)), jnp.ones((M,), bool))
        _, (ys_x, ys_y, ys_inf) = jax.lax.scan(
            step, init, (same, sx, sy), unroll=2
        )
        # lift back to projective for the carry fixup + scatter: z = 0 for
        # identity lanes, Montgomery one otherwise
        ys = PointBatch(
            ys_x, ys_y,
            jnp.where(ys_inf[:, None, :], jnp.zeros((), jnp.uint32),
                      one_m[None]),
        )
    else:
        _mixed = _mixed_select()

        def step(acc: PointBatch, inp):
            s, cx, cy = inp
            acc = _mixed(s, acc, cx, cy)
            return acc, acc

        _, ys = jax.lax.scan(
            step, vesta.identity((M,)), (same, sx, sy), unroll=2
        )
    # ys: PointBatch of (L, 16, M) — within-chunk inclusive segment sums

    # ---- cross-chunk carry fixup (log-width over the chunk-lane axis)
    d_first = d_chunk[:, 0]
    d_last = d_chunk[:, -1]
    trailing = PointBatch(ys.x[-1], ys.y[-1], ys.z[-1])  # (16, M)
    window_start = (
        jnp.arange(M, dtype=jnp.int32) % lanes_per_window
    ) == 0
    prev = jnp.concatenate([d_last[:1], d_last[:-1]])  # d_last[k-1]
    connects = jnp.logical_and(d_first == prev, ~window_start)
    allsame_prev = jnp.concatenate(
        [jnp.zeros((1,), bool), (d_first == d_last)[:-1]]
    )
    ident1 = vesta.identity((M,))
    t_prev = PointBatch(
        _shift_lanes(trailing.x, 1, ident1.x),
        _shift_lanes(trailing.y, 1, ident1.y),
        _shift_lanes(trailing.z, 1, ident1.z),
    )
    C = vesta.select(connects, t_prev, ident1)  # carry contribution
    A = jnp.logical_and(connects, allsame_prev)  # propagate flag
    dshift = 1
    while dshift < lanes_per_window:
        Cs = PointBatch(
            _shift_lanes(C.x, dshift, ident1.x),
            _shift_lanes(C.y, dshift, ident1.y),
            _shift_lanes(C.z, dshift, ident1.z),
        )
        As = jnp.concatenate(
            [jnp.zeros((dshift,), bool), A[:-dshift]]
        )
        C = _psel(A, Cs, C)
        A = jnp.logical_and(A, As)
        dshift *= 2
    # C[k] = carry arriving into chunk k; applies at the end of the chunk's
    # first segment (position e = count of leading d_first digits - 1)
    e = jnp.sum(d_chunk == d_first[:, None], axis=-1) - 1  # (M,)
    ge = jnp.take_along_axis(ys.x, e[None, None, :], axis=0)
    gey = jnp.take_along_axis(ys.y, e[None, None, :], axis=0)
    gez = jnp.take_along_axis(ys.z, e[None, None, :], axis=0)
    at_e = PointBatch(ge[0], gey[0], gez[0])  # (16, M)
    fixed = _padd(at_e, C)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (L, 1, M), 0) == e[None, None, :]
    )
    ys = PointBatch(
        jnp.where(onehot, fixed.x[None], ys.x),
        jnp.where(onehot, fixed.y[None], ys.y),
        jnp.where(onehot, fixed.z[None], ys.z),
    )

    # ---- scatter global segment ends into buckets (exact integer adds)
    flat = lambda a: jnp.moveaxis(a, 0, -1).reshape(
        N_LIMBS, G, n_pad
    ).reshape(N_LIMBS, G * n_pad)
    fx, fy, fz = flat(ys.x), flat(ys.y), flat(ys.z)
    ids = jnp.where(ends, d_sorted, spill)
    ids = ids + (jnp.arange(G, dtype=jnp.int32) * (n_buckets + 1))[:, None]
    ids_flat = ids.reshape(G * n_pad)

    def scatter(coord):
        out = jax.ops.segment_sum(
            coord.T, ids_flat, num_segments=G * (n_buckets + 1)
        ).T
        return out.reshape(N_LIMBS, G, n_buckets + 1)

    bx, by, bz = scatter(fx), scatter(fy), scatter(fz)
    empty = jnp.all(
        jnp.concatenate([bx, by, bz], axis=0) == 0, axis=0
    )
    by = jnp.where(empty[None], FQ.ones((G, n_buckets + 1)), by)
    return PointBatch(bx, by, bz)


def _weighted_bucket_reduce_inner(buckets: PointBatch, c: int) -> PointBatch:
    """Σ_{d=1}^{2^c - 1} d · B_d for all windows at once.

    buckets: batch (W, ≥2^c); slots beyond 2^c excluded.  Splits d = hi·S+lo:
      Σ d·B = S·Σ_hi hi·T_hi  +  Σ_hi U_hi,
      T_hi = Σ_lo B[hi,lo],  U_hi = Σ_{lo≥1} Suf[hi,lo],
    with the lo-axis suffix sums done as a serial scan at full (W·H) width
    (2 adds per bucket — work-optimal), and hi combines at log depth.
    Returns batch (W,).
    """
    nw = buckets.x.shape[1]
    n_buckets = 1 << c
    s_lo = c // 2
    S = 1 << s_lo
    H = n_buckets // S
    shape = (N_LIMBS, nw, H, S)
    bx = buckets.x[..., :n_buckets].reshape(shape)
    by = buckets.y[..., :n_buckets].reshape(shape)
    bz = buckets.z[..., :n_buckets].reshape(shape)
    # serial suffix scan over lo: acc_j = Σ_{lo≥j} B;  U += acc_j for j≥1
    xs = (
        jnp.moveaxis(bx, -1, 0)[::-1],  # (S, 16, W, H), lo = S-1 .. 0
        jnp.moveaxis(by, -1, 0)[::-1],
        jnp.moveaxis(bz, -1, 0)[::-1],
        jnp.arange(S - 1, -1, -1),
    )

    _padd, _psel, _pdbl = _ops()

    def step(carry, inp):
        acc, tot = carry
        cx, cy, cz, j = inp
        acc = _padd(acc, PointBatch(cx, cy, cz))
        tot = _psel(
            jnp.broadcast_to(j >= 1, tot.x.shape[1:]), acc, tot
        )
        return (acc, tot), None

    ident = vesta.identity((nw, H))
    (T, U), _ = jax.lax.scan(step, (ident, ident), xs)
    # X = Σ_hi hi·T_hi via suffix doubling; Y = Σ_hi U_hi via tree
    X = _suffix_weighted(T)
    Y = _tree_reduce_last(U)
    for _ in range(s_lo):
        X = _pdbl(X)
    return _padd(X, Y)


def _weighted_bucket_reduce_signed(buckets: PointBatch, c: int) -> PointBatch:
    """Σ_{d=1}^{2^(c−1)} d · B_d for signed-digit buckets.

    buckets: batch (W, 2^(c−1) + 2) — ids 0..2^(c−1) plus the spill slot.
    The range [1, 2^(c−1)) reuses the hi/lo reduction at c−1 bits; the top
    bucket contributes 2^(c−1)·B via c−1 doublings.
    """
    half_bits = c - 1
    half = 1 << half_bits
    main = _weighted_bucket_reduce_inner(buckets, half_bits)
    top = PointBatch(
        buckets.x[..., half], buckets.y[..., half], buckets.z[..., half]
    )
    _padd, _psel, _pdbl = _ops()
    for _ in range(half_bits):
        top = _pdbl(top)
    return _padd(main, top)


def _suffix_weighted(T: PointBatch) -> PointBatch:
    """Σ_hi hi·T[..., hi] via log-depth suffix sums then a tree sum."""
    H = T.x.shape[-1]
    ident = vesta.identity(T.x.shape[1:])
    d = 1
    x = T
    while d < H:
        shifted = PointBatch(
            jnp.concatenate([x.x[..., d:], ident.x[..., :d]], axis=-1),
            jnp.concatenate([x.y[..., d:], ident.y[..., :d]], axis=-1),
            jnp.concatenate([x.z[..., d:], ident.z[..., :d]], axis=-1),
        )
        x = _ops()[0](x, shifted)
        d *= 2
    # x[..., j] = Σ_{hi≥j} T; Σ_{j≥1} x_j = Σ hi·T_hi
    x = PointBatch(x.x[..., 1:], x.y[..., 1:], x.z[..., 1:])
    return _tree_reduce_last(x)


def _tree_reduce_last(x: PointBatch) -> PointBatch:
    while x.x.shape[-1] > 1:
        n = x.x.shape[-1]
        if n % 2:
            ident = vesta.identity(x.x.shape[1:-1] + (1,))
            x = PointBatch(
                jnp.concatenate([x.x, ident.x], axis=-1),
                jnp.concatenate([x.y, ident.y], axis=-1),
                jnp.concatenate([x.z, ident.z], axis=-1),
            )
            n += 1
        h = n // 2
        x = _ops()[0](
            PointBatch(x.x[..., :h], x.y[..., :h], x.z[..., :h]),
            PointBatch(x.x[..., h:], x.y[..., h:], x.z[..., h:]),
        )
    return PointBatch(x.x[..., 0], x.y[..., 0], x.z[..., 0])


def _combine_windows_inner(window_sums: PointBatch, c: int) -> PointBatch:
    """Horner: Σ_w 2^{cw} S_w over batch (W, *rest) -> (*rest)."""
    nw = window_sums.x.shape[1]
    _padd, _psel, _pdbl = _ops()

    def body(i, acc):
        w = nw - 1 - i
        sw = PointBatch(
            jax.lax.dynamic_index_in_dim(window_sums.x, w, 1, keepdims=False),
            jax.lax.dynamic_index_in_dim(window_sums.y, w, 1, keepdims=False),
            jax.lax.dynamic_index_in_dim(window_sums.z, w, 1, keepdims=False),
        )

        def dbl(_, p):
            return _pdbl(p)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        return _padd(acc, sw)

    return jax.lax.fori_loop(
        0, nw, body, vesta.identity(window_sums.x.shape[2:])
    )


_combine_windows = partial(jax.jit, static_argnums=1)(_combine_windows_inner)


def _bucket_sums_all(
    digits: jnp.ndarray, signs: jnp.ndarray, points: PointBatch, c: int,
    affine: bool = False,
) -> PointBatch:
    """Bucket sums for every digit vector: (W_total, N) bucket ids + signs
    -> batch (W_total, 2^(c−1) + 2) (signed-digit range + spill slot).

    Groups bound peak memory; `lax.map` over groups compiles the group
    body once and runs groups sequentially (traceable inside jit).
    """
    w_total, n = digits.shape
    n_buckets = (1 << (c - 1)) + 1  # ids 0..2^(c−1); spill index = n_buckets
    G, lanes, L, _ = _plan(n, w_total)
    n_groups = -(-w_total // G)
    if n_groups * G != w_total:  # pad with zero digit vectors
        digits = jnp.pad(digits, ((0, n_groups * G - w_total), (0, 0)))
        signs = jnp.pad(signs, ((0, n_groups * G - w_total), (0, 0)))
    grouped = digits.reshape(n_groups, G, n)
    grouped_s = signs.reshape(n_groups, G, n)
    if n_groups == 1:
        out = _group_bucket_sums_inner(
            grouped[0], grouped_s[0], points, c, lanes, L, n_buckets, affine
        )
    else:
        mapped = jax.lax.map(
            lambda ds: _group_bucket_sums_inner(
                ds[0], ds[1], points, c, lanes, L, n_buckets, affine
            ),
            (grouped, grouped_s),
        )  # PointBatch of (n_groups, 16, G, B+1)
        out = PointBatch(
            *(
                jnp.moveaxis(a, 0, 1).reshape(
                    N_LIMBS, n_groups * G, a.shape[-1]
                )
                for a in mapped
            )
        )
    return PointBatch(
        out.x[:, :w_total], out.y[:, :w_total], out.z[:, :w_total]
    )


# Lane budget below which the bit-serial small-MSM path is used instead of
# Pippenger.  Pippenger's XLA graph (sort + segmented scan + carry fixup)
# takes ~200 s to compile on CPU (and minutes on TPU); the bit-serial scan
# compiles in seconds and its O(256·N) adds are irrelevant at these sizes.
# This is what makes k≤8 test circuits and the multi-chip dryrun cheap.
_SMALL_MSM_LANES = 1 << 15


def _bits_msb_first(scalars_plain: jnp.ndarray) -> jnp.ndarray:
    """(16, ...) plain limbs -> (256, ...) bool bits, MSB first."""
    rows = []
    for limb in range(N_LIMBS - 1, -1, -1):
        for b in range(15, -1, -1):
            rows.append((scalars_plain[limb] >> np.uint32(b)) & 1)
    return jnp.stack(rows).astype(bool)


@jax.jit
def _msm_small_call(scalars_plain, points):
    """Σ s_i·P_i for small N: per-lane double-and-add + one tree reduce."""
    bits = _bits_msb_first(scalars_plain)  # (256, N)
    _padd, _psel, _pdbl = _ops()

    def step(acc, bit):
        acc = _pdbl(acc)
        return _psel(bit, points, acc), None

    n = scalars_plain.shape[-1]
    acc, _ = jax.lax.scan(step, vesta.identity((n,)), bits)
    return _tree_reduce_last(acc)


@jax.jit
def _msm_many_small_call(scalars_plain, points):
    """(16, B, N) small batched MSM: lanes (B, N), reduce over N."""
    _, B, n = scalars_plain.shape
    bits = _bits_msb_first(scalars_plain)  # (256, B, N)
    pts_b = PointBatch(
        jnp.broadcast_to(points.x[:, None], (N_LIMBS, B, n)),
        jnp.broadcast_to(points.y[:, None], (N_LIMBS, B, n)),
        jnp.broadcast_to(points.z[:, None], (N_LIMBS, B, n)),
    )
    _padd, _psel, _pdbl = _ops()

    def step(acc, bit):
        acc = _pdbl(acc)
        return _psel(bit, pts_b, acc), None

    acc, _ = jax.lax.scan(step, vesta.identity((B, n)), bits)
    return _tree_reduce_last(acc)


def _check_affine_precondition(points: PointBatch) -> None:
    """Debug-only assertion that every lane has z in {0, Montgomery one}.

    The bucket pipeline lifts points as (x, y, 1) via the mixed add, so a
    non-normalized projective input above the small-MSM cutoff would be
    silently wrong (ADVICE r4).  Cost is one elementwise compare + reduce
    over the z limbs, so it is gated on TINYRAM_DEBUG.
    """
    if not os.environ.get("TINYRAM_DEBUG"):
        return
    z = points.z
    one = FQ.ones(z.shape[1:])
    is_zero = jnp.all(z == 0, axis=0)
    is_one = jnp.all(z == one, axis=0)
    ok = bool(jax.device_get(jnp.all(is_zero | is_one)))
    if not ok:
        raise ValueError(
            "msm: points must be affine-or-identity (z per lane 0 or "
            "Montgomery one); normalize with to_affine_host/from_affine_host"
        )


@partial(jax.jit, static_argnums=(2, 3))
def _msm_call(scalars_plain, points, c, affine=False):
    digits, signs = signed_digits(scalars_plain, c)  # (W, N)
    buckets = _bucket_sums_all(digits, signs, points, c, affine)
    window_sums = _weighted_bucket_reduce_signed(buckets, c)
    return _combine_windows_inner(window_sums, c)


def msm(
    scalars_plain: jnp.ndarray,
    points: PointBatch,
    window_bits: int | None = None,
) -> PointBatch:
    """Full Pippenger MSM (one jitted dispatch end-to-end).

    scalars_plain: (16, N) **plain-form** scalar limbs (use
    `FP.from_mont` first if coming from Montgomery-form field data).
    points: PointBatch with batch (N,), **affine-or-identity** — every
    lane's z must be 0 (identity) or Montgomery one, as produced by
    `vesta.from_affine_host` / the SRS.  The Pippenger path (n > 2^15)
    uses the mixed Algorithm-8 add, which reads only (x, y) and treats
    z == 0 as identity; arbitrary projective z would give a silently
    wrong result.  Set TINYRAM_DEBUG=1 to assert the precondition.
    Returns a single projective point (batch ()).
    """
    n = scalars_plain.shape[-1]
    if n <= _SMALL_MSM_LANES:
        return _msm_small_call(scalars_plain, points)
    _check_affine_precondition(points)
    c = window_bits or choose_window_bits(n)
    return _msm_call(scalars_plain, points, c, _affine_scan())


def msm_many(
    scalars_plain: jnp.ndarray,
    points: PointBatch,
    window_bits: int | None = None,
) -> PointBatch:
    """MSM of B scalar vectors against one point set in a single fused pass.

    scalars_plain: (16, B, N) plain-form scalar limbs.
    Returns a PointBatch with batch shape (B,).

    This is the workhorse for committing every advice/fixed/instance column
    of a PLONK circuit at once: all W·B windows run through the same
    bucket pipeline (in memory-bounded groups) instead of B sequential
    Pippenger runs.

    Points must be **affine-or-identity** (z per lane 0 or Montgomery
    one) — see `msm` for why; TINYRAM_DEBUG=1 asserts it.
    """
    _, B, n = scalars_plain.shape
    if B * n <= _SMALL_MSM_LANES:
        return _msm_many_small_call(scalars_plain, points)
    _check_affine_precondition(points)
    c = window_bits or choose_window_bits(n)
    return _msm_many_call(scalars_plain, points, c, _affine_scan())


@partial(jax.jit, static_argnums=(2, 3))
def _msm_many_call(scalars_plain, points, c, affine=False):
    _, B, n = scalars_plain.shape
    n_windows = -(-SCALAR_BITS // c)
    # scalar_digits only indexes the limb axis, so it maps over (B, N)
    digits, signs = signed_digits(scalars_plain, c)  # (W, B, N)
    digits_flat = digits.transpose(1, 0, 2).reshape(B * n_windows, n)
    signs_flat = signs.transpose(1, 0, 2).reshape(B * n_windows, n)
    buckets = _bucket_sums_all(digits_flat, signs_flat, points, c, affine)
    wsums = _weighted_bucket_reduce_signed(buckets, c)  # batch (B*W,)
    per_col = PointBatch(
        wsums.x.reshape(N_LIMBS, B, n_windows).transpose(0, 2, 1),
        wsums.y.reshape(N_LIMBS, B, n_windows).transpose(0, 2, 1),
        wsums.z.reshape(N_LIMBS, B, n_windows).transpose(0, 2, 1),
    )  # batch (W, B)
    return _combine_windows_inner(per_col, c)
