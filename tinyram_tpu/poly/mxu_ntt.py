"""MXU-accelerated NTT: radix-R DFT stages as int8 systolic matmuls.

The VPU Montgomery-multiply ceiling on v5e is ~150-175M mul/s (BENCH_r01 /
pallas kernels), which caps any butterfly NTT near ~15M elems/s at 2^20.
The MXU does ~400 TOPS of s8×s8→s32 — this module moves the O(n log n)
multiply work there:

  * Field elements (Montgomery form) are sliced into D = 37 seven-bit
    digits (pure masking, no carries; 7 bits keeps every digit in int8).
  * A radix-R stage  out[k, l] = Σ_j W[k, j] · x[j, l]  becomes ONE int8
    matmul over digits:

        acc[k1, k, k2, l] = Σ_j W7[k1, k, j] · X7[j, k2, l]

    (W in PLAIN form so Montgomery inputs stay Montgomery — no Montgomery
    reduction anywhere, just a wide-integer mod-p reduction of the column
    sums).  Column sums ≤ R·127² < 2^21, and the (k1+k2) anti-diagonal
    combine keeps values < 2^27 — exact in int32.
  * The 2D−1 = 73 digit columns are reduced mod p on the VPU: carry-
    normalize to 16-bit limbs, then fold the high 256 bits with the
    precomputed 2^(16i)·2^256 mod p table (one small shared matmul-like
    accumulation), then a final conditional subtract.

Composed with the same four-step recursion as pallas_ntt (natural order,
cross twiddles folded into the NEXT level's DFT matrices where possible).
This file provides the stage primitive + a full transform `ntt_mxu` whose
junction twiddles use the existing VPU Montgomery multiply.

Numerics verified bit-exactly against poly.ntt on CPU (f32/int32 XLA dots
are exact for these ranges); throughput measured by scripts/bench_mxu_ntt.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field.jfield import Field
from ..field.params import N_LIMBS, int_to_limbs

DIGIT_BITS = 7
N_DIGITS = 37  # ceil(256 / 7)
N_COLS = 2 * N_DIGITS - 1  # 73 anti-diagonal columns


def _field(field_name: str) -> Field:
    from ..field.jfield import FP, FQ

    return FP if field_name == "Fp" else FQ


def _omega(field_name: str, log_n: int, inverse: bool) -> int:
    f = _field(field_name)
    p = f.modulus
    w = pow(f.params.root_of_unity, 1 << (f.params.two_adicity - log_n), p)
    return pow(w, p - 2, p) if inverse else w


def limbs_to_digits7(x: jnp.ndarray) -> jnp.ndarray:
    """(16, ...) u32 16-bit limbs -> (37, ...) int8 7-bit digits.

    Pure bit-slicing: digit i covers value bits [7i, 7i+7), which span at
    most two 16-bit limbs.
    """
    outs = []
    for i in range(N_DIGITS):
        lo_bit = 7 * i
        l0, s = divmod(lo_bit, 16)
        d = x[l0] >> np.uint32(s)
        if s + 7 > 16 and l0 + 1 < N_LIMBS:
            d = d | (x[l0 + 1] << np.uint32(16 - s))
        outs.append(d & np.uint32(0x7F))
    return jnp.stack(outs).astype(jnp.int8)


@lru_cache(maxsize=None)
def _dft_digit_matrix(field_name: str, log_r: int, inverse: bool,
                      scale: int = 1):
    """(37, R, R) int8 host tensor: 7-bit digits of scale·ω_R^{kj} mod p
    in PLAIN (non-Montgomery) form."""
    f = _field(field_name)
    p = f.modulus
    R = 1 << log_r
    w = _omega(field_name, log_r, inverse)
    pows = [1] * R
    for i in range(1, R):
        pows[i] = pows[i - 1] * w % p
    out = np.zeros((N_DIGITS, R, R), dtype=np.int8)
    for k in range(R):
        for j in range(R):
            v = pows[(k * j) % R] * scale % p
            for i in range(N_DIGITS):
                out[i, k, j] = (v >> (7 * i)) & 0x7F
    return out


def digits_cols_to_mont(field_name: str, acc: jnp.ndarray) -> jnp.ndarray:
    """(73, ...) int32 anti-diagonal digit columns (weight 2^(7c)) ->
    (16, ...) u32 canonical limbs mod p.

    Carry-normalize the 73 columns (values < 2^27, total value < R·p²
    < 2^517) into 16-bit limbs, split value = lo + mid·2^256 + top·2^512
    (mid < 2^256, top < 2^16), and fold the high parts back with one
    Montgomery multiply each by the constants 2^256·R and 2^512·R mod p.
    """
    from ..field.jfield import FP, FQ

    f = FP if field_name == "Fp" else FQ
    acc = acc.astype(jnp.uint32)
    batch = acc.shape[1:]
    # column c has weight 2^(7c); scatter each (< 2^27) value into the
    # three 16-bit limbs it spans.  Per-limb accumulation stays < 2^20.
    n_wide = 34  # ceil(517 / 16) + 1
    limbs = [jnp.zeros(batch, jnp.uint32) for _ in range(n_wide)]
    for c in range(N_COLS):
        bit = 7 * c
        l0, s = divmod(bit, 16)
        v = acc[c]
        limbs[l0] = limbs[l0] + ((v << np.uint32(s)) & np.uint32(0xFFFF))
        limbs[l0 + 1] = limbs[l0 + 1] + (
            (v >> np.uint32(16 - s)) & np.uint32(0xFFFF)
        )
        if s > 5:  # bits above 32−s exist only when s+27 > 32
            limbs[l0 + 2] = limbs[l0 + 2] + (v >> np.uint32(32 - s))
    carry = jnp.zeros(batch, jnp.uint32)
    norm = []
    for l in range(n_wide):
        t = limbs[l] + carry
        norm.append(t & np.uint32(0xFFFF))
        carry = t >> np.uint32(16)
    zeros = jnp.zeros(batch, jnp.uint32)
    lo = jnp.stack(norm[:16])  # < 2^256
    mid = jnp.stack(norm[16:32])  # < 2^256
    top = jnp.stack(norm[32:34] + [zeros] * 14)  # < 2^32
    # hi·2^k mod p via one Montgomery mul: f.const(v) holds v·R, so
    # mont_mul(hi_plain, const(2^k)) = hi·(2^k·R)·R^{-1} = hi·2^k (mod p)
    c256 = f.const(pow(2, 256, f.modulus), len(batch))
    c512 = f.const(pow(2, 512, f.modulus), len(batch))
    mid_part = f.mul(mid, c256)
    top_part = f.mul(top, c512)
    # lo < 2^256 < 4p: up to three conditional subtracts
    out = lo
    for _ in range(2):
        out = f._cond_sub_p(out)
    out = f._cond_sub_p(out)
    return f.add(f.add(out, mid_part), top_part)


def dft_stage(
    x: jnp.ndarray,  # (16, R, L) u32 Montgomery limbs
    field_name: str,
    log_r: int,
    inverse: bool,
    scale: int = 1,
) -> jnp.ndarray:
    """One radix-R DFT along axis 1 via the int8 MXU matmul."""
    R = 1 << log_r
    L = x.shape[-1]
    W7 = jnp.asarray(
        _dft_digit_matrix(field_name, log_r, inverse, scale)
    )  # (37, R, R) int8
    X7 = limbs_to_digits7(x)  # (37, R, L) int8
    # acc[k1, k, k2, l] = Σ_j W7[k1,k,j] · X7[k2,j,l]
    lhs = W7.reshape(N_DIGITS * R, R)
    rhs = X7.transpose(1, 0, 2).reshape(R, N_DIGITS * L)
    acc = jax.lax.dot_general(
        lhs, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (37·R, 37·L) int32
    acc = acc.reshape(N_DIGITS, R, N_DIGITS, L)
    # anti-diagonal combine: col[c] = Σ_{k1+k2=c} acc[k1, :, k2, :]
    cols = []
    for c in range(N_COLS):
        terms = []
        for k1 in range(max(0, c - N_DIGITS + 1), min(N_DIGITS, c + 1)):
            terms.append(acc[k1, :, c - k1, :])
        t = terms[0]
        for term in terms[1:]:
            t = t + term
        cols.append(t)
    col_stack = jnp.stack(cols)  # (73, R, L) int32, each < 2^27
    return digits_cols_to_mont(field_name, col_stack)


R_MAX = 128  # max single-matmul DFT radix (one 128-wide MXU contraction)


def _base_mxu(x, field_name, log_s, inverse, mult):
    out = dft_stage(x, field_name, log_s, inverse)
    if mult is not None:
        out = _field(field_name).mul(out, mult)
    return out


@partial(jax.jit, static_argnames=("field_name", "inverse"))
def _ntt_mxu_impl(a, field_name, inverse):
    from .ntt import _mont_table
    from .pallas_ntt import four_step

    f = _field(field_name)
    lead = a.shape[:-1]
    n = a.shape[-1]
    B = 1
    for d in lead[1:]:
        B *= d
    x = jnp.moveaxis(a.reshape(N_LIMBS, B, n), 1, 2)  # (16, n, B)
    mult = None
    if inverse:
        n_inv = pow(n, f.modulus - 2, f.modulus)
        inv_tbl = jnp.asarray(_mont_table(f, [n_inv]))
        mult = jnp.broadcast_to(inv_tbl[:, :, None], (N_LIMBS, n, B))
    out = four_step(x, field_name, inverse, mult, _base_mxu, R_MAX)
    return jnp.moveaxis(out, 2, 1).reshape(a.shape)


def ntt_mxu(field: Field, a: jnp.ndarray, inverse: bool = False):
    """Drop-in for poly.ntt.ntt with MXU digit-matmul DFT stages."""
    n = a.shape[-1]
    assert n & (n - 1) == 0
    if n == 1:
        return a
    return _ntt_mxu_impl(a, field.params.name, inverse)
