"""Pallas TPU NTT: VMEM-resident multi-stage butterfly kernels.

The jnp NTT (poly/ntt.py) emits one XLA fusion per butterfly stage; every
stage round-trips the whole (16, n) limb array through HBM ~30 times
(~3.8M elems/s measured at 2^16 — BENCH_r01).  This module keeps entire
sub-transforms in VMEM:

  * ``_ntt_stages``: the pure butterfly math — a full S-point NTT
    (S ≤ 256) along axis 0 of (S, L) limb-vector lists: log2(S) stages,
    Montgomery multiplies via the Pasta-prime-sparse SOS reduction from
    field/pallas_mul.  Shared by the Pallas kernel and an eager jnp path
    (CPU tests compare it bit-exactly against poly.ntt.ntt; interpret-mode
    pallas_call is unusable on CPU — see tests/test_pallas_point.py).
  * ``colntt``: recursive four-step decomposition for larger S.  With
    S = a·b (index i = i1·b + i2 along the transform axis):

        X[k1 + a·k2] = NTT_b over i2 of ( ω_S^{k1·i2} · NTT_a over i1 )

    so: colNTT_a on the (a, b·L) view, multiply by the (k1, i2) twiddle
    table (fused into the kernel as an output multiplier), transpose the
    (a, b) axes, recurse on b.  The (k2, k1) result flattens directly to
    natural order — **no bit-reversal pass exists anywhere**; the base
    kernel's in-tile bit-reversal is a static sublane gather.
  * ``ntt_pallas``: drop-in replacement for poly.ntt.ntt on TPU; the
    inverse transform folds the 1/n scale into the last level's output
    multiplier.

Replaces the FFT inside the reference's unvendored halo2 fork (used by
`create_proof`/keygen — SURVEY.md §3.3, native-component ledger).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field.jfield import Field
from ..field.params import N_LIMBS, FieldParams, fp_params, fq_params
from ..field.pallas_mul import (
    field_limbs,
    mod_add_vecs,
    mod_sub_vecs,
    mont_mul_vecs,
)

# max sublane extent handled by a single kernel launch: (16, 256, 128) u32
# data = 2 MB in + 2 MB out (+ optional 2 MB multiplier) — comfortably in
# the ~16 MB of VMEM with double buffering.
S_MAX = 256
LANE_BLOCK = 128


def _field(field_name: str) -> Field:
    from ..field.jfield import FP, FQ

    return FP if field_name == "Fp" else FQ


def _params(field_name: str) -> FieldParams:
    return fp_params() if field_name == "Fp" else fq_params()


def _omega(field_name: str, log_n: int, inverse: bool) -> int:
    f = _field(field_name)
    p = f.modulus
    w = pow(f.params.root_of_unity, 1 << (f.params.two_adicity - log_n), p)
    return pow(w, p - 2, p) if inverse else w


@lru_cache(maxsize=None)
def _packed_stage_twiddles(field_name: str, log_s: int, inverse: bool):
    """(16, S/2, log_s) host table of pre-expanded Stockham twiddles.

    Entry [:, p·2^t + q, t] = ω_{S/2^t}^p (q < 2^t, p < S/2^{t+1}) — i.e.
    stage t's twiddle already repeated ``stride`` times, so the kernel
    reads stage t as the (S/2, 1) sublane slice tw[:, :, t:t+1] and
    broadcasts it across lanes (Mosaic cannot move lane data to sublanes,
    which rules out slicing a lane-packed table)."""
    from .ntt import _mont_table

    f = _field(field_name)
    p = f.modulus
    s_len = 1 << log_s
    half = s_len // 2
    omega = _omega(field_name, log_s, inverse)
    vals = [1] * (half * log_s)  # row-major (S/2, log_s)
    for t in range(log_s):
        m = s_len >> (t + 1)
        stride = 1 << t
        w = pow(omega, 1 << t, p)  # ω_{n_cur}, n_cur = S/2^t
        wp = 1
        for pp in range(m):
            for q in range(stride):
                vals[(pp * stride + q) * log_s + t] = wp
            wp = wp * w % p
    tbl = _mont_table(f, vals)  # (16, half*log_s)
    return tbl.reshape(N_LIMBS, half, log_s)


def _ntt_stages(
    xs: list,  # 16 limb arrays, each (S, L)
    tw_rows: list,  # 16 arrays, each (S/2, log_s): expanded stage twiddles
    p_limbs: tuple,
    n0inv: np.uint32,
    log_s: int,
    mult_rows: list | None = None,  # optional (S, L) output multiplier
) -> list:
    """Stockham autosort DIF NTT along axis 0 (pure jnp; runs in-kernel or
    eagerly).  Natural order in AND out — no bit-reversal gather (Mosaic
    cannot lower sublane gathers), and all arithmetic stays 2-D with the
    lane axis minor.

    Stage t views the data as (n_cur, stride) with n_cur = S/2^t,
    stride = 2^t; with halves a, b of the n_cur axis (= the top/bottom
    sublane halves, since p is the major index):
        out[p, 0, q] = a[p, q] + b[p, q]
        out[p, 1, q] = (a[p, q] − b[p, q]) · ω_{n_cur}^p
    written back as (m, 2·stride) for the next stage.
    """
    S = 1 << log_s
    half = S // 2
    lanes = xs[0].shape[-1]
    for t in range(log_s):
        m = S >> (t + 1)
        stride = 1 << t
        a = [x[:half] for x in xs]
        b = [x[half:] for x in xs]
        w = [tw[:, t : t + 1] for tw in tw_rows]  # (S/2, 1), lane-broadcast
        s_ = mod_sub_vecs(a, b, p_limbs)
        hi = mont_mul_vecs(s_, w, p_limbs, n0inv)
        lo = mod_add_vecs(a, b, p_limbs)
        xs = [
            jnp.stack(
                [l.reshape(m, stride, lanes), h.reshape(m, stride, lanes)],
                axis=1,
            ).reshape(S, lanes)
            for l, h in zip(lo, hi)
        ]
    if mult_rows is not None:
        xs = mont_mul_vecs(xs, mult_rows, p_limbs, n0inv)
    return xs


@lru_cache(maxsize=None)
def _kernel_fn(field_name: str, log_s: int, has_mult: bool):
    params = _params(field_name)
    p_limbs = field_limbs(params)
    n0inv = np.uint32(params.n0_inv)

    def kernel(x_ref, tw_ref, *rest):
        if has_mult:
            mult_ref, o_ref = rest
            mult = [mult_ref[i] for i in range(N_LIMBS)]
        else:
            (o_ref,) = rest
            mult = None
        xs = [x_ref[i] for i in range(N_LIMBS)]
        tw = [tw_ref[i] for i in range(N_LIMBS)]
        out = _ntt_stages(xs, tw, p_limbs, n0inv, log_s, mult)
        for i in range(N_LIMBS):
            o_ref[i] = out[i]

    return kernel


@partial(jax.jit, static_argnames=("field_name", "log_s"))
def _colntt_kernel_call(
    x: jnp.ndarray,  # (16, S, L_pad), L_pad % LANE_BLOCK == 0
    tw: jnp.ndarray,  # (16, S/2, log_s) expanded stage twiddles
    mult: jnp.ndarray | None,  # (16, S, L_pad) output multiplier or None
    field_name: str,
    log_s: int,
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = 1 << log_s
    lanes = x.shape[-1]
    grid = (lanes // LANE_BLOCK,)
    spec = pl.BlockSpec((N_LIMBS, S, LANE_BLOCK), lambda i: (0, 0, i))
    tw_spec = pl.BlockSpec((N_LIMBS, S // 2, log_s), lambda i: (0, 0, 0))
    kernel = _kernel_fn(field_name, log_s, mult is not None)
    in_specs = [spec, tw_spec] + ([spec] if mult is not None else [])
    args = (x, tw) + ((mult,) if mult is not None else ())
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N_LIMBS, S, lanes), jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec,
        # the unrolled SOS Montgomery stages keep ~32 live limb columns;
        # the default 16 MB scoped-vmem budget is too small at S = 256
        # (v5e has 128 MiB of VMEM)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(*args)


@partial(jax.jit, static_argnames=("field_name", "log_s"))
def _colntt_jnp_call(x, tw, mult, field_name, log_s):
    """Eager-math twin of the kernel call (CPU tests / non-TPU backends)."""
    params = _params(field_name)
    p_limbs = field_limbs(params)
    n0inv = np.uint32(params.n0_inv)
    xs = [x[i] for i in range(N_LIMBS)]
    tws = [tw[i] for i in range(N_LIMBS)]
    ms = [mult[i] for i in range(N_LIMBS)] if mult is not None else None
    out = _ntt_stages(xs, tws, p_limbs, n0inv, log_s, ms)
    return jnp.stack(out)


@lru_cache(maxsize=None)
def _cross_twiddles_host(
    field_name: str, log_a: int, log_b: int, inverse: bool, scale: int
):
    """Host (16, a, b) table: scale · ω_{a·b}^{k1·i2} in Montgomery form."""
    f = _field(field_name)
    p = f.modulus
    s_len = 1 << (log_a + log_b)
    omega = _omega(field_name, log_a + log_b, inverse)
    pows = np.empty(s_len, dtype=object)
    cur = 1
    for i in range(s_len):  # one bigint mul per entry; cached per size
        pows[i] = cur * scale % p
        cur = cur * omega % p
    a, b = 1 << log_a, 1 << log_b
    idx = np.multiply.outer(
        np.arange(a, dtype=np.int64), np.arange(b, dtype=np.int64)
    ).ravel()  # k1·i2 < a·b always, so no mod needed
    from .ntt import _mont_table

    tbl = _mont_table(f, [int(pows[i]) for i in idx])  # (16, a*b)
    return tbl.reshape(N_LIMBS, a, b)


def _cross_repeat_budget() -> int:
    """Byte budget for materializing a repeated cross-twiddle operand
    (TINYRAM_NTT_CROSS_MB, default 256 MB — sized so the k≥14 quotient
    slab chunks fall through to the memory-lean transpose path while the
    bench-scale standalone batched transforms take the fast one)."""
    import os

    return int(os.environ.get("TINYRAM_NTT_CROSS_MB", "256")) * (1 << 20)


def _choose_split(log_s: int) -> tuple[int, int]:
    """log_a + log_b = log_s with a ≤ S_MAX, preferring a balanced split
    so the recursion bottoms out fast and lanes stay wide."""
    log_max = S_MAX.bit_length() - 1
    log_a = min(log_max, (log_s + 1) // 2)
    return log_a, log_s - log_a


def _pad_lanes(x: jnp.ndarray) -> jnp.ndarray:
    pad = (-x.shape[-1]) % LANE_BLOCK
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad))) if pad else x


def _base_pallas(x, field_name, log_s, inverse, mult):
    tw = jnp.asarray(_packed_stage_twiddles(field_name, log_s, inverse))
    L = x.shape[-1]
    xp = _pad_lanes(x)
    mp = _pad_lanes(mult) if mult is not None else None
    out = _colntt_kernel_call(xp, tw, mp, field_name, log_s)
    return out[:, :, :L] if L != xp.shape[-1] else out


def _base_jnp(x, field_name, log_s, inverse, mult):
    tw = jnp.asarray(_packed_stage_twiddles(field_name, log_s, inverse))
    return _colntt_jnp_call(x, tw, mult, field_name, log_s)


def four_step(
    x: jnp.ndarray,  # (16, S, L)
    field_name: str,
    inverse: bool,
    mult: jnp.ndarray | None,  # (16, S, L) output multiplier
    base_fn,
    s_max: int,
) -> jnp.ndarray:
    """Natural-order NTT along axis 1 via the recursive four-step split,
    with ``base_fn(x, field_name, log_s, inverse, mult)`` as the ≤ s_max
    sub-transform (Pallas butterflies, the eager jnp twin, or the MXU
    digit-matmul stage — see mxu_ntt.py)."""
    S, L = x.shape[1], x.shape[2]
    log_s = S.bit_length() - 1
    assert 1 << log_s == S
    if S <= s_max:
        return base_fn(x, field_name, log_s, inverse, mult)

    log_max = s_max.bit_length() - 1
    log_a = min(log_max, (log_s + 1) // 2)
    a, b = 1 << log_a, 1 << (log_s - log_a)
    # stage A: colNTT_a over the (a, b·L) view (always a single base call,
    # since a ≤ s_max), then the cross twiddle as an eager broadcast-fused
    # multiply.  Round 4: the twiddle used to be materialized to the full
    # (16, a, b·L) data size and passed as the kernel's output multiplier —
    # at k=14's extended domain with ~190-column stacks that tripled peak
    # HBM inside the jitted quotient slabs and crashed the TPU worker
    # (logs/bench_prover_r3e.log).  The eager multiply lets XLA fuse the
    # (16, a, b) table broadcast without ever materializing it; the extra
    # HBM pass is noise (the transform is VPU-compute-bound, ROADMAP r3).
    xa = x.reshape(N_LIMBS, a, b * L)
    cross = jnp.asarray(
        _cross_twiddles_host(field_name, log_a, log_s - log_a, inverse, 1)
    )  # (16, a, b)
    y = four_step(xa, field_name, inverse, None, base_fn, s_max)
    f = _field(field_name)
    if L % 128 == 0 or L >= 512:
        y = f.mul(
            y.reshape(N_LIMBS, a, b, L), cross[:, :, :, None]
        ).reshape(N_LIMBS, a, b * L)
    elif L % 8 == 0 and a * b * L * 64 <= _cross_repeat_budget():
        # mid-size L (the 8-256-column batched transforms the prover
        # actually issues): materialize the cross twiddle repeated L×
        # along lanes — ONE aligned full-width multiply, no transposes.
        # Costs one data-sized operand, so it is budget-gated: the k=14
        # quotient slabs (dozens of live transforms) must keep the
        # transpose path below (r4 OOM, logs/bench_prover_r4.log).
        rep = jnp.repeat(cross[:, :, :, None], L, axis=3).reshape(
            N_LIMBS, a, b * L
        )
        y = f.mul(y, rep)
    else:
        # small L (e.g. a 52-column chunk inside a quotient slab): a
        # (…, b, L) minor-dim layout pads L up to 128 lanes in every HLO
        # temp — 2.5x memory expansion that OOMed the k=14 prover
        # (logs/bench_prover_r4.log).  Put b on the lane axis instead.
        y4 = y.reshape(N_LIMBS, a, b, L).transpose(0, 1, 3, 2)
        y4 = f.mul(y4, cross[:, :, None, :])
        y = y4.transpose(0, 1, 3, 2).reshape(N_LIMBS, a, b * L)
    # middle transpose (a, b) -> (b, a); recurse on b with the caller's mult
    y = y.reshape(N_LIMBS, a, b, L).transpose(0, 2, 1, 3)
    m_rec = None
    if mult is not None:
        # mult is indexed by k = k1 + a·k2; the recursion's output axes are
        # (k2, k1), and reshape(S) -> (b, a) views k as (k2-major, k1-minor)
        m_rec = mult.reshape(N_LIMBS, b, a, L).reshape(N_LIMBS, b, a * L)
    z = four_step(
        y.reshape(N_LIMBS, b, a * L), field_name, inverse, m_rec,
        base_fn, s_max,
    )
    return z.reshape(N_LIMBS, b * a, L)


def colntt(
    x: jnp.ndarray,  # (16, S, L)
    field_name: str,
    inverse: bool,
    mult: jnp.ndarray | None = None,  # (16, S, L) output multiplier
    use_kernel: bool = True,
) -> jnp.ndarray:
    """Natural-order NTT along axis 1, optionally times ``mult`` at output."""
    base = _base_pallas if use_kernel else _base_jnp
    return four_step(x, field_name, inverse, mult, base, S_MAX)


@partial(jax.jit, static_argnames=("field_name", "inverse", "use_kernel"))
def _ntt_pallas_impl(a, field_name, inverse, use_kernel=True):
    f = _field(field_name)
    lead = a.shape[:-1]
    n = a.shape[-1]
    B = 1
    for d in lead[1:]:
        B *= d
    x = a.reshape(N_LIMBS, B, n)
    x = jnp.moveaxis(x, 1, 2)  # (16, n, B): transform axis -> sublanes
    out = colntt(x, field_name, inverse, mult=None, use_kernel=use_kernel)
    out = jnp.moveaxis(out, 2, 1)  # (16, B, n): n back on the lane axis
    if inverse:
        # 1/n scale as an eager broadcast-fused multiply (round 4: the
        # broadcast_to (16, n, B) mult was materialized at the pallas_call
        # boundary — full data size for nothing).  Applied AFTER the
        # moveaxis so the multiply's minor dims are (B, n) — with n on
        # lanes there is no small-minor-dim padding blow-up.
        n_inv = pow(n, f.modulus - 2, f.modulus)
        from .ntt import _mont_table

        inv_tbl = jnp.asarray(_mont_table(f, [n_inv]))  # (16, 1)
        out = f.mul(out, inv_tbl[:, :, None])
    return out.reshape(a.shape)


def ntt_pallas(
    field: Field, a: jnp.ndarray, inverse: bool = False,
    use_kernel: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for poly.ntt.ntt: (16, ..., n) transform along the last axis.

    use_kernel=None auto-selects: real Pallas kernels on TPU, the eager
    jnp twin elsewhere (bit-identical math, used by the CPU test mesh).
    """
    n = a.shape[-1]
    assert n & (n - 1) == 0
    if n == 1:
        return a
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    return _ntt_pallas_impl(a, field.params.name, inverse, use_kernel)
