"""Radix-2 NTT over the Pasta fields, vectorized for TPU.

Replaces the FFT/coset-FFT inside the reference's halo2 fork (used implicitly
by `create_proof`/keygen — SURVEY.md §3.3).  Design notes:

  * Iterative Cooley–Tukey with a host-precomputed bit-reversal gather and
    per-stage twiddle tables in Montgomery form.  Each stage is a reshape +
    one batched field multiply + add/sub — no data-dependent control flow,
    so the whole transform jits into one XLA program.
  * Arrays are limb-major ``(16, n)`` (see field.jfield); the transform axis
    is the trailing axis, which is the TPU lane axis.
  * Twiddle tables are cached per (field, log2 n) and total n-1 elements.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field.jfield import Field
from ..field.params import N_LIMBS, int_to_limbs


def _bitrev_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def _mont_table(field: Field, values: list[int]) -> np.ndarray:
    """Python ints -> (16, len) Montgomery limb table.

    Returns a **host** numpy array so results can be lru_cached safely and
    turned into constants inside jitted callers (a cached device array
    created during tracing would leak tracers).
    """
    r = field.params.r_mod_p
    p = field.modulus
    return np.array(
        [int_to_limbs((v * r) % p) for v in values], dtype=np.uint32
    ).T


@lru_cache(maxsize=None)
def _stage_twiddles(field_name: str, log_n: int, inverse: bool):
    from ..field.jfield import FP, FQ

    field = FP if field_name == "Fp" else FQ
    p = field.modulus
    omega = pow(
        field.params.root_of_unity, 1 << (field.params.two_adicity - log_n), p
    )
    if inverse:
        omega = pow(omega, p - 2, p)
    tables = []
    for s in range(log_n):
        m = 1 << s  # half-size of butterflies at this stage
        w = pow(omega, 1 << (log_n - 1 - s), p)  # primitive 2m-th root
        ws = [pow(w, j, p) for j in range(m)]
        tables.append(_mont_table(field, ws))
    rev = _bitrev_indices(log_n)
    return rev, tuple(tables)


def omega_for(field: Field, log_n: int, inverse: bool = False) -> int:
    p = field.modulus
    w = pow(field.params.root_of_unity, 1 << (field.params.two_adicity - log_n), p)
    return pow(w, p - 2, p) if inverse else w


@partial(jax.jit, static_argnums=(0, 2))
def ntt(field: Field, a: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """In-order NTT of ``a`` (16, ..., n) along the last axis.

    Forward: coeffs -> evals at (1, ω, ω², …) in natural order.
    Inverse: evals -> coeffs (including the 1/n scale).

    On TPU, transforms of ≥ 2^9 points route to the VMEM-resident Pallas
    kernels (poly/pallas_ntt.py) — disable with TINYRAM_NO_PALLAS=1, or
    set TINYRAM_NTT=mxu to route them to the int8 digit-matmul MXU path
    (poly/mxu_ntt.py) instead; scripts/bench_mxu_ntt.py measures both.
    """
    import os

    n = a.shape[-1]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n, "NTT size must be a power of two"
    if n == 1:
        return a
    if (
        n >= 512
        and jax.default_backend() == "tpu"
        and not os.environ.get("TINYRAM_NO_PALLAS")
    ):
        if os.environ.get("TINYRAM_NTT") == "mxu":
            from .mxu_ntt import ntt_mxu

            return ntt_mxu(field, a, inverse=inverse)
        from .pallas_ntt import ntt_pallas

        return ntt_pallas(field, a, inverse=inverse, use_kernel=True)
    rev, tables = _stage_twiddles(field.params.name, log_n, inverse)
    out = jnp.take(a, rev, axis=-1)
    lead = a.shape[:-1]  # (16, ...) leading dims
    for s in range(log_n):
        m = 1 << s
        groups = n // (2 * m)
        v = out.reshape(*lead, groups, 2, m)
        lo = v[..., 0, :]
        hi = v[..., 1, :]
        w = tables[s].reshape(
            (N_LIMBS,) + (1,) * (len(lead) - 1) + (1, m)
        )  # broadcast over groups
        t = field.mul(hi, w)
        new_lo = field.add(lo, t)
        new_hi = field.sub(lo, t)
        out = jnp.stack([new_lo, new_hi], axis=-2).reshape(*lead, n)
    if inverse:
        n_inv = pow(n, field.modulus - 2, field.modulus)
        out = field.mul(out, _scalar(field, n_inv, out.ndim))
    return out


def _scalar(field: Field, value: int, ndim: int) -> jnp.ndarray:
    """A single field constant, Montgomery form, broadcastable to (16, ...)."""
    p = field.modulus
    r = field.params.r_mod_p
    limbs = np.array(int_to_limbs((value * r) % p), dtype=np.uint32)
    return jnp.asarray(limbs).reshape((N_LIMBS,) + (1,) * (ndim - 1))


def powers(field: Field, base: int, n: int) -> jnp.ndarray:
    """Device table [1, b, b², …, b^{n-1}] (Montgomery), built host-side."""
    p = field.modulus
    vals = [1] * n
    for i in range(1, n):
        vals[i] = (vals[i - 1] * base) % p
    return _mont_table(field, vals)


@partial(jax.jit, static_argnums=(0, 2))
def powers_device(field: Field, x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Device-computed powers [1, x, …, x^{n-1}] for a device scalar x (16,).

    Log-doubling: O(log n) batched multiplies, no serial chain.
    """
    assert n & (n - 1) == 0, "n must be a power of two"
    out = field.ones((1,))  # (16, 1)
    cur = x[:, None]  # x^(2^j) as (16, 1)
    length = 1
    while length < n:
        out = jnp.concatenate([out, field.mul(out, cur)], axis=1)
        cur = field.mul(cur, cur)
        length *= 2
    return out


def coeff_scale(field: Field, a: jnp.ndarray, g: int) -> jnp.ndarray:
    """Scale coefficient i by g^i (used for coset evaluation)."""
    n = a.shape[-1]
    tbl = powers(field, g, n)
    return field.mul(a, tbl.reshape((N_LIMBS,) + (1,) * (a.ndim - 2) + (n,)))


@partial(jax.jit, static_argnums=0)
def eval_poly(field: Field, coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate (16, ..., n) coefficient vectors at device scalar x (16,)."""
    n = coeffs.shape[-1]
    m = 1 << (n - 1).bit_length() if n > 1 else 1
    pw = powers_device(field, x, max(m, 1))[:, :n]
    pw = pw.reshape((coeffs.shape[0],) + (1,) * (coeffs.ndim - 2) + (n,))
    prods = field.mul(coeffs, pw)
    return tree_sum(field, prods)


@partial(jax.jit, static_argnums=(0, 2))
def tree_sum(field: Field, a: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Field sum along an axis via log-depth pairwise reduction."""
    a = jnp.moveaxis(a, axis, -1)
    n = a.shape[-1]
    while n > 1:
        if n % 2 == 1:
            a = jnp.concatenate(
                [a, field.zeros(a.shape[1:-1] + (1,))], axis=-1
            )
            n += 1
        a = field.add(a[..., : n // 2], a[..., n // 2 :])
        n = a.shape[-1]
    return a[..., 0]
