"""Batched Vesta point arithmetic on TPU (homogeneous projective, complete).

TPU-native replacement for the EC group ops inside the reference's halo2
fork (SURVEY.md §2 "Native-component ledger": Jacobian add/double + Pippenger
MSM).  Key design choice: **complete** addition formulas for a = 0 short
Weierstrass curves (Renes–Costello–Batina 2016, Algorithm 7).  Completeness
makes point addition a total, associative operator over every input —
including the identity and doubling cases — which is exactly what
`jax.lax.associative_scan`-based bucket accumulation in the MSM needs: no
data-dependent branching, no incomplete-case probability arguments.

A point batch is a NamedTuple of three (16, *batch) Fq limb arrays (a JAX
pytree), identity = (0 : 1 : 0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..field.jfield import FQ
from ..field.params import N_LIMBS


class PointBatch(NamedTuple):
    """Homogeneous projective Vesta points, coordinates in Montgomery form."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[1:]


def identity(batch_shape=()) -> PointBatch:
    return PointBatch(
        FQ.zeros(batch_shape), FQ.ones(batch_shape), FQ.zeros(batch_shape)
    )


def from_affine_host(points) -> PointBatch:
    """List of host affine points ((x, y) or None) -> device PointBatch."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0), ys.append(1), zs.append(0)
        else:
            xs.append(pt[0]), ys.append(pt[1]), zs.append(1)
    return PointBatch(FQ.encode(xs), FQ.encode(ys), FQ.encode(zs))


def to_affine_host(p: PointBatch):
    """Device PointBatch -> list of host affine points (or None)."""
    xs = FQ.decode(p.x)
    ys = FQ.decode(p.y)
    zs = FQ.decode(p.z)
    out = []
    q = FQ.modulus
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, q - 2, q)
            out.append((x * zi % q, y * zi % q))
    return out


def _mul_by_3b(t: jnp.ndarray) -> jnp.ndarray:
    """t * 15 (b = 5, 3b = 15) via add chain: 16t - t."""
    t2 = FQ.double(t)
    t4 = FQ.double(t2)
    t8 = FQ.double(t4)
    t16 = FQ.double(t8)
    return FQ.sub(t16, t)


@jax.jit
def add(p: PointBatch, q: PointBatch) -> PointBatch:
    """Complete addition, RCB16 Algorithm 7 specialized to a = 0, b3 = 15."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    m, a, s = FQ.mul, FQ.add, FQ.sub

    t0 = m(X1, X2)
    t1 = m(Y1, Y2)
    t2 = m(Z1, Z2)
    t3 = a(X1, Y1)
    t4 = a(X2, Y2)
    t3 = m(t3, t4)
    t4 = a(t0, t1)
    t3 = s(t3, t4)          # X1Y2 + X2Y1
    t4 = a(Y1, Z1)
    X3 = a(Y2, Z2)
    t4 = m(t4, X3)
    X3 = a(t1, t2)
    t4 = s(t4, X3)          # Y1Z2 + Y2Z1
    X3 = a(X1, Z1)
    Y3 = a(X2, Z2)
    X3 = m(X3, Y3)
    Y3 = a(t0, t2)
    Y3 = s(X3, Y3)          # X1Z2 + X2Z1
    X3 = a(t0, t0)
    t0 = a(X3, t0)          # 3·X1X2
    t2 = _mul_by_3b(t2)     # 3b·Z1Z2
    Z3 = a(t1, t2)
    t1 = s(t1, t2)
    Y3 = _mul_by_3b(Y3)     # 3b·(X1Z2 + X2Z1)
    X3 = m(t4, Y3)
    t2 = m(t3, t1)
    X3 = s(t2, X3)
    Y3 = m(Y3, t0)
    t1 = m(t1, Z3)
    Y3 = a(t1, Y3)
    t0 = m(t0, t3)
    Z3 = m(Z3, t4)
    Z3 = a(Z3, t0)
    return PointBatch(X3, Y3, Z3)


@jax.jit
def add_mixed(p: PointBatch, qx: jnp.ndarray, qy: jnp.ndarray) -> PointBatch:
    """p + (qx, qy, 1), RCB16 Algorithm 8 (mixed, a = 0, b3 = 15).

    Complete in p (including identity); q must NOT be the identity — the
    MSM routes identity inputs to the spill bucket before using this
    (curve/msm.py).  One multiply and the whole Z2 operand cheaper than
    the full Algorithm 7 — the win that matters is the scan's dropped
    Z-coordinate gather.
    """
    X1, Y1, Z1 = p
    X2, Y2 = qx, qy
    m, a, s = FQ.mul, FQ.add, FQ.sub

    t0 = m(X1, X2)
    t1 = m(Y1, Y2)
    t3 = a(X2, Y2)
    t4 = a(X1, Y1)
    t3 = m(t3, t4)
    t4 = a(t0, t1)
    t3 = s(t3, t4)          # X1Y2 + X2Y1
    t4 = m(Y2, Z1)
    t4 = a(t4, Y1)          # Y1 + Y2Z1
    Y3 = m(X2, Z1)
    Y3 = a(Y3, X1)          # X1 + X2Z1
    X3 = a(t0, t0)
    t0 = a(X3, t0)          # 3·X1X2
    t2 = _mul_by_3b(Z1)     # 3b·Z1
    Z3 = a(t1, t2)
    t1 = s(t1, t2)
    Y3 = _mul_by_3b(Y3)     # 3b·(X1 + X2Z1)
    X3 = m(t4, Y3)
    t2 = m(t3, t1)
    X3 = s(t2, X3)
    Y3 = m(Y3, t0)
    t1 = m(t1, Z3)
    Y3 = a(t1, Y3)
    t0 = m(t0, t3)
    Z3 = m(Z3, t4)
    Z3 = a(Z3, t0)
    return PointBatch(X3, Y3, Z3)


@jax.jit
def double(p: PointBatch) -> PointBatch:
    """Exception-free doubling, RCB16 Algorithm 9 (a = 0, b3 = 15)."""
    X, Y, Z = p
    m, a, s = FQ.mul, FQ.add, FQ.sub

    t0 = m(Y, Y)
    Z3 = a(t0, t0)
    Z3 = a(Z3, Z3)
    Z3 = a(Z3, Z3)          # 8Y²
    t1 = m(Y, Z)
    t2 = m(Z, Z)
    t2 = _mul_by_3b(t2)     # 3b·Z²
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
    return PointBatch(X3, Y3, Z3)


def neg(p: PointBatch) -> PointBatch:
    return PointBatch(p.x, FQ.neg(p.y), p.z)


def select(mask: jnp.ndarray, p: PointBatch, q: PointBatch) -> PointBatch:
    """where(mask, p, q) with mask shaped like the batch."""
    return PointBatch(
        FQ.select(mask, p.x, q.x),
        FQ.select(mask, p.y, q.y),
        FQ.select(mask, p.z, q.z),
    )


def is_identity(p: PointBatch) -> jnp.ndarray:
    return FQ.is_zero(p.z)


def eq(p: PointBatch, q: PointBatch) -> jnp.ndarray:
    """Group equality via cross-multiplication (handles identity)."""
    both_inf = jnp.logical_and(FQ.is_zero(p.z), FQ.is_zero(q.z))
    one_inf = jnp.logical_xor(FQ.is_zero(p.z), FQ.is_zero(q.z))
    x_cross = FQ.eq(FQ.mul(p.x, q.z), FQ.mul(q.x, p.z))
    y_cross = FQ.eq(FQ.mul(p.y, q.z), FQ.mul(q.y, p.z))
    finite_eq = jnp.logical_and(x_cross, y_cross)
    return jnp.where(both_inf, True, jnp.where(one_inf, False, finite_eq))


@jax.jit
def scalar_mul(scalar_bits: jnp.ndarray, p: PointBatch) -> PointBatch:
    """Double-and-add over a (255, *batch) bit array (msb first)."""
    nbits = scalar_bits.shape[0]

    def body(i, acc):
        acc = double(acc)
        with_p = add(acc, p)
        take = scalar_bits[i].astype(bool)
        return select(take, with_p, acc)

    return jax.lax.fori_loop(0, nbits, body, identity(p.batch_shape))
