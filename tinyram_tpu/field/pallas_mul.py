"""Pallas TPU kernel: fused batched Montgomery multiplication.

The jnp path (jfield.Field.mul) emits ~150 separate HLO ops whose
intermediates XLA may spill to HBM; this kernel runs the whole SOS
Montgomery multiply for a (16, block) tile inside VMEM — one launch, one
HBM read per operand, one write.

Opt-in via `TINYRAM_PALLAS=1` (or call `mul_pallas` directly); validated
against the jnp path in tests (interpret mode on CPU) and on the real
chip by bench.py.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .params import LIMB_BITS, LIMB_MASK, N_LIMBS, FieldParams

_MASK = np.uint32(LIMB_MASK)
_SHIFT = np.uint32(LIMB_BITS)


def field_limbs(params: FieldParams) -> tuple[int, ...]:
    return tuple(
        (params.modulus >> (16 * i)) & 0xFFFF for i in range(N_LIMBS)
    )


def cond_sub_p(out: list, p_limbs: tuple) -> list:
    """Reduce a limb vector known to be < 2p into [0, p) (in-kernel)."""
    base = np.uint32(1 << LIMB_BITS)
    zero = jnp.zeros_like(out[0])
    diff = []
    borrow = zero
    for i in range(N_LIMBS):
        t = out[i] + (base - np.uint32(p_limbs[i])) - borrow
        diff.append(t & _MASK)
        borrow = np.uint32(1) - (t >> _SHIFT)
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, out[i], diff[i]) for i in range(N_LIMBS)]


def mont_mul_vecs(a: list, b: list, p_limbs: tuple, n0inv: np.uint32) -> list:
    """SOS Montgomery multiply on lists of 16 limb vectors (in-kernel).

    The reduction pass exploits the Pasta prime limb structure (8 zero
    limbs, one 1, one power of two): ~96 real multiplies instead of 256.
    """
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * N_LIMBS)
    for i in range(N_LIMBS):
        for j in range(N_LIMBS):
            prod = a[i] * b[j]
            cols[i + j] = cols[i + j] + (prod & _MASK)
            if i + j + 1 < 2 * N_LIMBS:
                cols[i + j + 1] = cols[i + j + 1] + (prod >> _SHIFT)
    for i in range(N_LIMBS):
        m = (cols[i] * n0inv) & _MASK
        for j in range(N_LIMBS):
            pj = int(p_limbs[j])
            if pj == 0:
                continue
            if pj == 1:
                prod = m
            elif pj & (pj - 1) == 0:  # power of two: shift, not multiply
                prod = m << np.uint32(pj.bit_length() - 1)
            else:
                prod = m * np.uint32(pj)
            cols[i + j] = cols[i + j] + (prod & _MASK)
            if i + j + 1 < 2 * N_LIMBS:
                cols[i + j + 1] = cols[i + j + 1] + (prod >> _SHIFT)
        if i + 1 < 2 * N_LIMBS:
            cols[i + 1] = cols[i + 1] + (cols[i] >> _SHIFT)
    # carry-normalize the top half
    out = []
    carry = zero
    for i in range(N_LIMBS):
        v = cols[N_LIMBS + i] + carry
        out.append(v & _MASK)
        carry = v >> _SHIFT
    return cond_sub_p(out, p_limbs)


def mod_add_vecs(a: list, b: list, p_limbs: tuple) -> list:
    """(a + b) mod p on limb-vector lists (a, b < p; in-kernel)."""
    out = []
    carry = jnp.zeros_like(a[0])
    for i in range(N_LIMBS):
        v = a[i] + b[i] + carry
        out.append(v & _MASK)
        carry = v >> _SHIFT
    return cond_sub_p(out, p_limbs)


def mod_sub_vecs(a: list, b: list, p_limbs: tuple) -> list:
    """(a - b) mod p on limb-vector lists (a, b < p; in-kernel)."""
    base = np.uint32(1 << LIMB_BITS)
    zero = jnp.zeros_like(a[0])
    diff = []
    borrow = zero
    for i in range(N_LIMBS):
        t = a[i] + (base - b[i]) - borrow
        diff.append(t & _MASK)
        borrow = np.uint32(1) - (t >> _SHIFT)
    out = []
    carry = zero
    for i in range(N_LIMBS):
        v = diff[i] + borrow * np.uint32(p_limbs[i]) + carry
        out.append(v & _MASK)
        carry = v >> _SHIFT
    return out


def _make_kernel(params: FieldParams):
    p_limbs = field_limbs(params)
    n0inv = np.uint32(params.n0_inv)

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(N_LIMBS)]
        b = [b_ref[i] for i in range(N_LIMBS)]
        out = mont_mul_vecs(a, b, p_limbs, n0inv)
        for i in range(N_LIMBS):
            o_ref[i] = out[i]

    return kernel


@partial(jax.jit, static_argnames=("block", "interpret", "field_name"))
def _mul_pallas(a, b, field_name: str = "Fp", block: int = 2048,
                interpret: bool = False):
    from jax.experimental import pallas as pl

    from .params import fp_params, fq_params

    params = fp_params() if field_name == "Fp" else fq_params()
    kernel = _make_kernel(params)
    n = a.shape[-1]
    assert a.shape == b.shape == (N_LIMBS, n)
    blk = min(block, n)
    assert n % blk == 0, f"batch {n} not divisible by block {blk}"
    if blk % 1024 == 0 and n % 128 == 0:
        # (rows, 128) sublane×lane tiles: full (8, 128) u32 vregs per
        # limb op (round 4 — 1-D limb rows used 1 of 8 sublanes)
        rows, sub = n // 128, blk // 128
        spec = pl.BlockSpec((N_LIMBS, sub, 128), lambda i: (0, i, 0))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N_LIMBS, rows, 128), jnp.uint32),
            grid=(rows // sub,),
            in_specs=[spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(a.reshape(N_LIMBS, rows, 128), b.reshape(N_LIMBS, rows, 128))
        return out.reshape(N_LIMBS, n)
    grid = (n // blk,)
    spec = pl.BlockSpec((N_LIMBS, blk), lambda i: (0, i))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a, b)


def mul_pallas(a, b, field=None, block: int = 512, interpret: bool = False):
    """Fused Montgomery multiply; same contract as Field.mul for (16, n)."""
    name = "Fp" if field is None else field.params.name
    return _mul_pallas(a, b, field_name=name, block=block, interpret=interpret)


def pallas_enabled() -> bool:
    return bool(os.environ.get("TINYRAM_PALLAS"))
