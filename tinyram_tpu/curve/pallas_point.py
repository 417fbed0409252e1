"""Pallas TPU kernels: fused complete Vesta point operations.

The jnp path (curve.vesta.add) issues 12 separate Montgomery multiplies,
each a standalone XLA fusion whose intermediates round-trip HBM.  These
kernels run the whole RCB16 complete-add (Algorithm 7, a=0, b3=15) for a
(16, block) lane tile inside VMEM: 6 coordinate reads, 3 writes, zero
intermediate HBM traffic.

Variants:
  * padd(p, q)                      — complete add
  * padd_select(mask, acc, p)      — select(mask, acc + p, p): the inner
    step of the MSM's chunked segmented-scan bucket accumulation (one
    kernel per scan step instead of ~40 XLA fusions).
  * pdouble(p)                     — exception-free doubling (Algorithm 9)

All take/return (16, *batch) uint32 Fq limb arrays in Montgomery form;
wrappers flatten the batch, pad lanes to the block size, and dispatch to
the jnp path on non-TPU backends (so the same code runs under the CPU
test mesh).

Layout (round 4): the lane axis is reshaped to (rows, 128) sublane×lane
tiles before the kernel, so every per-limb op runs on full (8, 128)
vregs.  The previous 1-D (block,) limb rows occupied ONE sublane of each
(8, 128) u32 vreg — 12.5% VPU utilization — which is why the fused point
kernels measured ~95M effective modmul/s while the (S, L)-shaped NTT
kernels reached ~170M/s on the same chip (ROADMAP r3 numbers).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field.params import N_LIMBS, fq_params
from ..field.pallas_mul import (
    field_limbs,
    mod_add_vecs,
    mod_sub_vecs,
    mont_mul_vecs,
)
from .vesta import PointBatch

_BLOCK = 2048  # lanes per launch; reshaped to (_BLOCK // 128, 128) tiles
_LANE = 128


def _fq_consts():
    params = fq_params()
    return field_limbs(params), np.uint32(params.n0_inv)


def _mul_by_3b(t: list, p_limbs: tuple) -> list:
    """t * 15 (b = 5, 3b = 15): 16t - t via 4 doublings and a subtract."""
    t2 = mod_add_vecs(t, t, p_limbs)
    t4 = mod_add_vecs(t2, t2, p_limbs)
    t8 = mod_add_vecs(t4, t4, p_limbs)
    t16 = mod_add_vecs(t8, t8, p_limbs)
    return mod_sub_vecs(t16, t, p_limbs)


def _add_body(X1, Y1, Z1, X2, Y2, Z2, p_limbs, n0inv):
    """RCB16 Algorithm 7 on limb-vector lists; returns (X3, Y3, Z3)."""
    m = lambda a, b: mont_mul_vecs(a, b, p_limbs, n0inv)
    a = lambda x, y: mod_add_vecs(x, y, p_limbs)
    s = lambda x, y: mod_sub_vecs(x, y, p_limbs)

    t0 = m(X1, X2)
    t1 = m(Y1, Y2)
    t2 = m(Z1, Z2)
    t3 = a(X1, Y1)
    t4 = a(X2, Y2)
    t3 = m(t3, t4)
    t4 = a(t0, t1)
    t3 = s(t3, t4)
    t4 = a(Y1, Z1)
    X3 = a(Y2, Z2)
    t4 = m(t4, X3)
    X3 = a(t1, t2)
    t4 = s(t4, X3)
    X3 = a(X1, Z1)
    Y3 = a(X2, Z2)
    X3 = m(X3, Y3)
    Y3 = a(t0, t2)
    Y3 = s(X3, Y3)
    X3 = a(t0, t0)
    t0 = a(X3, t0)
    t2 = _mul_by_3b(t2, p_limbs)
    Z3 = a(t1, t2)
    t1 = s(t1, t2)
    Y3 = _mul_by_3b(Y3, p_limbs)
    X3 = m(t4, Y3)
    t2 = m(t3, t1)
    X3 = s(t2, X3)
    Y3 = m(Y3, t0)
    t1 = m(t1, Z3)
    Y3 = a(t1, Y3)
    t0 = m(t0, t3)
    Z3 = m(Z3, t4)
    Z3 = a(Z3, t0)
    return X3, Y3, Z3


def _rows(ref):
    return [ref[i] for i in range(N_LIMBS)]


def _write(ref, vecs):
    for i in range(N_LIMBS):
        ref[i] = vecs[i]


def _padd_kernel(px, py, pz, qx, qy, qz, ox, oy, oz):
    p_limbs, n0inv = _fq_consts()
    X3, Y3, Z3 = _add_body(
        _rows(px), _rows(py), _rows(pz),
        _rows(qx), _rows(qy), _rows(qz),
        p_limbs, n0inv,
    )
    _write(ox, X3), _write(oy, Y3), _write(oz, Z3)


def _padd_select_kernel(mk, px, py, pz, qx, qy, qz, ox, oy, oz):
    """out = mask ? p + q : q  (mask broadcast over limbs)."""
    p_limbs, n0inv = _fq_consts()
    X3, Y3, Z3 = _add_body(
        _rows(px), _rows(py), _rows(pz),
        _rows(qx), _rows(qy), _rows(qz),
        p_limbs, n0inv,
    )
    keep = mk[0].astype(jnp.bool_)
    for i in range(N_LIMBS):
        ox[i] = jnp.where(keep, X3[i], qx[i])
        oy[i] = jnp.where(keep, Y3[i], qy[i])
        oz[i] = jnp.where(keep, Z3[i], qz[i])


def _madd_body(X1, Y1, Z1, X2, Y2, p_limbs, n0inv):
    """RCB16 Algorithm 8 (mixed, a=0, b3=15): P1 projective + (X2, Y2, 1).

    11 muls (vs 12) and no Z2 operand — the MSM scan drops its whole
    Z-coordinate gather.  Complete in P1 incl. identity; P2 must be
    finite (curve/msm.py routes identity inputs to the spill bucket)."""
    m = lambda a, b: mont_mul_vecs(a, b, p_limbs, n0inv)
    a = lambda x, y: mod_add_vecs(x, y, p_limbs)
    s = lambda x, y: mod_sub_vecs(x, y, p_limbs)

    t0 = m(X1, X2)
    t1 = m(Y1, Y2)
    t3 = a(X2, Y2)
    t4 = a(X1, Y1)
    t3 = m(t3, t4)
    t4 = a(t0, t1)
    t3 = s(t3, t4)
    t4 = m(Y2, Z1)
    t4 = a(t4, Y1)
    Y3 = m(X2, Z1)
    Y3 = a(Y3, X1)
    X3 = a(t0, t0)
    t0 = a(X3, t0)
    t2 = _mul_by_3b(Z1, p_limbs)
    Z3 = a(t1, t2)
    t1 = s(t1, t2)
    Y3 = _mul_by_3b(Y3, p_limbs)
    X3 = m(t4, Y3)
    t2 = m(t3, t1)
    X3 = s(t2, X3)
    Y3 = m(Y3, t0)
    t1 = m(t1, Z3)
    Y3 = a(t1, Y3)
    t0 = m(t0, t3)
    Z3 = m(Z3, t4)
    Z3 = a(Z3, t0)
    return X3, Y3, Z3


def _madd_select_kernel(mk, ax, ay, az, qx, qy, ox, oy, oz):
    """out = mask ? acc + (qx, qy, 1) : (qx, qy, 1)."""
    from ..field.params import fq_params

    p_limbs, n0inv = _fq_consts()
    one_limbs = tuple(
        (fq_params().r_mod_p >> (16 * i)) & 0xFFFF for i in range(N_LIMBS)
    )
    X3, Y3, Z3 = _madd_body(
        _rows(ax), _rows(ay), _rows(az),
        _rows(qx), _rows(qy),
        p_limbs, n0inv,
    )
    keep = mk[0].astype(jnp.bool_)
    for i in range(N_LIMBS):
        ox[i] = jnp.where(keep, X3[i], qx[i])
        oy[i] = jnp.where(keep, Y3[i], qy[i])
        oz[i] = jnp.where(
            keep, Z3[i], jnp.full_like(Z3[i], np.uint32(one_limbs[i]))
        )


def _pdouble_kernel(px, py, pz, ox, oy, oz):
    """RCB16 Algorithm 9 (a = 0, b3 = 15)."""
    p_limbs, n0inv = _fq_consts()
    m = lambda a, b: mont_mul_vecs(a, b, p_limbs, n0inv)
    a = lambda x, y: mod_add_vecs(x, y, p_limbs)
    s = lambda x, y: mod_sub_vecs(x, y, p_limbs)
    X, Y, Z = _rows(px), _rows(py), _rows(pz)

    t0 = m(Y, Y)
    Z3 = a(t0, t0)
    Z3 = a(Z3, Z3)
    Z3 = a(Z3, Z3)
    t1 = m(Y, Z)
    t2 = m(Z, Z)
    t2 = _mul_by_3b(t2, p_limbs)
    X3 = m(t2, Z3)
    Y3 = a(t0, t2)
    Z3 = m(t1, Z3)
    t1 = a(t2, t2)
    t2 = a(t1, t2)
    t0 = s(t0, t2)
    Y3 = m(t0, Y3)
    Y3 = a(X3, Y3)
    t1 = m(X, Y)
    X3 = m(t0, t1)
    X3 = a(X3, X3)
    _write(ox, X3), _write(oy, Y3), _write(oz, Z3)


def _flatten_pad(arrs, block):
    """(16, *batch) arrays -> (16, n_pad/128, 128) plus (batch_shape, n).

    The (rows, 128) tile shape keeps every kernel op on full u32 vregs
    (see module docstring)."""
    batch_shape = arrs[0].shape[1:]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    n_pad = -(-max(n, 1) // block) * block
    out = []
    for a in arrs:
        f = a.reshape(N_LIMBS, n)
        if n_pad != n:
            f = jnp.pad(f, ((0, 0), (0, n_pad - n)))
        out.append(f.reshape(N_LIMBS, n_pad // _LANE, _LANE))
    return out, batch_shape, n


def _unflatten(arrs, batch_shape, n):
    return [
        a.reshape(N_LIMBS, -1)[:, :n].reshape((N_LIMBS,) + batch_shape)
        for a in arrs
    ]


def _padd_call(p, q, block=_BLOCK, interpret=False):
    from jax.experimental import pallas as pl

    flats, bshape, n = _flatten_pad([p.x, p.y, p.z, q.x, q.y, q.z], block)
    rows = flats[0].shape[1]
    sub = block // _LANE
    spec = pl.BlockSpec((N_LIMBS, sub, _LANE), lambda i: (0, i, 0))
    outs = pl.pallas_call(
        _padd_kernel,
        out_shape=[jax.ShapeDtypeStruct((N_LIMBS, rows, _LANE), jnp.uint32)]
        * 3,
        grid=(rows // sub,),
        in_specs=[spec] * 6,
        out_specs=[spec] * 3,
        interpret=interpret,
    )(*flats)
    return PointBatch(*_unflatten(outs, bshape, n))


def _padd_select_call(mask, p, q, block=_BLOCK, interpret=False):
    from jax.experimental import pallas as pl

    flats, bshape, n = _flatten_pad([p.x, p.y, p.z, q.x, q.y, q.z], block)
    rows = flats[0].shape[1]
    sub = block // _LANE
    n_pad = rows * _LANE
    mflat = mask.reshape(1, n).astype(jnp.uint32)
    if n_pad != n:
        mflat = jnp.pad(mflat, ((0, 0), (0, n_pad - n)))
    mflat = mflat.reshape(1, rows, _LANE)
    spec = pl.BlockSpec((N_LIMBS, sub, _LANE), lambda i: (0, i, 0))
    mspec = pl.BlockSpec((1, sub, _LANE), lambda i: (0, i, 0))
    outs = pl.pallas_call(
        _padd_select_kernel,
        out_shape=[jax.ShapeDtypeStruct((N_LIMBS, rows, _LANE), jnp.uint32)]
        * 3,
        grid=(rows // sub,),
        in_specs=[mspec] + [spec] * 6,
        out_specs=[spec] * 3,
        interpret=interpret,
    )(mflat, *flats)
    return PointBatch(*_unflatten(outs, bshape, n))


def _madd_select_call(mask, acc, qx, qy, block=_BLOCK, interpret=False):
    from jax.experimental import pallas as pl

    flats, bshape, n = _flatten_pad([acc.x, acc.y, acc.z, qx, qy], block)
    rows = flats[0].shape[1]
    sub = block // _LANE
    n_pad = rows * _LANE
    mflat = mask.reshape(1, n).astype(jnp.uint32)
    if n_pad != n:
        mflat = jnp.pad(mflat, ((0, 0), (0, n_pad - n)))
    mflat = mflat.reshape(1, rows, _LANE)
    spec = pl.BlockSpec((N_LIMBS, sub, _LANE), lambda i: (0, i, 0))
    mspec = pl.BlockSpec((1, sub, _LANE), lambda i: (0, i, 0))
    outs = pl.pallas_call(
        _madd_select_kernel,
        out_shape=[jax.ShapeDtypeStruct((N_LIMBS, rows, _LANE), jnp.uint32)]
        * 3,
        grid=(rows // sub,),
        in_specs=[mspec] + [spec] * 5,
        out_specs=[spec] * 3,
        interpret=interpret,
    )(mflat, *flats)
    return PointBatch(*_unflatten(outs, bshape, n))


def _pdouble_call(p, block=_BLOCK, interpret=False):
    from jax.experimental import pallas as pl

    flats, bshape, n = _flatten_pad([p.x, p.y, p.z], block)
    rows = flats[0].shape[1]
    sub = block // _LANE
    spec = pl.BlockSpec((N_LIMBS, sub, _LANE), lambda i: (0, i, 0))
    outs = pl.pallas_call(
        _pdouble_kernel,
        out_shape=[jax.ShapeDtypeStruct((N_LIMBS, rows, _LANE), jnp.uint32)]
        * 3,
        grid=(rows // sub,),
        in_specs=[spec] * 3,
        out_specs=[spec] * 3,
        interpret=interpret,
    )(*flats)
    return PointBatch(*_unflatten(outs, bshape, n))


def use_pallas_points() -> bool:
    """Fused point kernels are on by default on TPU (TINYRAM_NO_PALLAS=1
    disables); off elsewhere (the CPU test mesh exercises the jnp path)."""
    if os.environ.get("TINYRAM_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


# jitted entry points for real use; interpret mode (tests) stays eager —
# wrapping the interpret path in jit makes XLA:CPU compile the kernel's
# thousands of inlined callback ops (minutes per variant).
_padd_jit = partial(jax.jit, static_argnames=("block", "interpret"))(_padd_call)
_psel_jit = partial(jax.jit, static_argnames=("block", "interpret"))(
    _padd_select_call
)
_pdbl_jit = partial(jax.jit, static_argnames=("block", "interpret"))(
    _pdouble_call
)


def padd(
    p: PointBatch, q: PointBatch,
    interpret: bool = False, block: int = _BLOCK,
) -> PointBatch:
    fn = _padd_call if interpret else _padd_jit
    return fn(p, q, block=block, interpret=interpret)


def padd_select(
    mask: jnp.ndarray, p: PointBatch, q: PointBatch,
    interpret: bool = False, block: int = _BLOCK,
) -> PointBatch:
    """select(mask, p + q, q) in one fused kernel."""
    fn = _padd_select_call if interpret else _psel_jit
    return fn(mask, p, q, block=block, interpret=interpret)


def pdouble(
    p: PointBatch, interpret: bool = False, block: int = _BLOCK
) -> PointBatch:
    fn = _pdouble_call if interpret else _pdbl_jit
    return fn(p, block=block, interpret=interpret)


_madd_jit = partial(jax.jit, static_argnames=("block", "interpret"))(
    _madd_select_call
)


def padd_select_mixed(
    mask: jnp.ndarray, acc: PointBatch, qx: jnp.ndarray, qy: jnp.ndarray,
    interpret: bool = False, block: int = _BLOCK,
) -> PointBatch:
    """select(mask, acc + (qx,qy,1), (qx,qy,1)) in one fused kernel.

    The MSM bucket scan's inner op (curve/msm.py): mixed Algorithm 8 —
    q enters affine, so the scan never gathers a Z coordinate."""
    fn = _madd_select_call if interpret else _madd_jit
    return fn(mask, acc, qx, qy, block=block, interpret=interpret)
