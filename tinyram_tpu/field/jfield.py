"""Batched prime-field arithmetic for TPU (JAX), shared by Fp and Fq.

Design (TPU-first, not a port):
  * A field element batch is a ``uint32`` array of shape ``(16, *batch)``:
    16 little-endian limbs of 16 bits, **limb axis first** so the batch axis
    lands on the VPU's 128-lane dimension and every limb operation is a
    full-width vector op.
  * Montgomery form with R = 2^256.  Multiplication is SOS (separated
    operand scanning) with lazy carries: 16x16 limb products are split into
    16-bit halves and accumulated into 32 columns; column magnitudes stay
    < 2^23, far inside uint32, so carries are propagated only twice per
    multiply.
  * Inversion is Fermat (x^(p-2)) via a `lax.fori_loop` square-and-multiply —
    ~510 batched multiplies but fully parallel across the batch, unlike the
    serial Montgomery-batch-inversion trick which is hostile to SIMD.
  * No data-dependent shapes anywhere; everything jits and vmaps.

The reference delegates all of this to the Rust `pasta_curves`/halo2 fork
(see SURVEY.md "Native-component ledger"); this module is its TPU-native
replacement built from the primes up.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .params import (
    LIMB_BITS,
    LIMB_MASK,
    N_LIMBS,
    FieldParams,
    fp_params,
    fq_params,
    int_to_limbs,
    limbs_to_int,
)

U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


def _const_limbs(x: int) -> np.ndarray:
    return np.array(int_to_limbs(x), dtype=np.uint32)


class Field:
    """Vectorized modular arithmetic for one prime field.

    All public methods take/return uint32 arrays shaped ``(16, *batch)`` in
    Montgomery form unless stated otherwise.  Methods are plain jnp code so
    they can be called from inside jit/shard_map/pallas-adjacent code.
    """

    def __init__(self, params: FieldParams):
        self.params = params
        self.modulus = params.modulus
        self._p = _const_limbs(params.modulus)
        self._n0inv = np.uint32(params.n0_inv)
        self._r = _const_limbs(params.r_mod_p)      # 1 in Montgomery form
        self._r2 = _const_limbs(params.r2_mod_p)
        self._inv_exp_bits = np.array(
            [int(b) for b in bin(params.modulus - 2)[2:]], dtype=np.int32
        )

    # ---------------------------------------------------------------- shapes

    @staticmethod
    def _bc(c: np.ndarray, like: jnp.ndarray) -> jnp.ndarray:
        """Broadcast a (16,) constant against a (16, *batch) operand."""
        return jnp.asarray(c, U32).reshape((N_LIMBS,) + (1,) * (like.ndim - 1))

    def zeros(self, batch_shape=()) -> jnp.ndarray:
        return jnp.zeros((N_LIMBS,) + tuple(batch_shape), U32)

    def ones(self, batch_shape=()) -> jnp.ndarray:
        """Montgomery one, broadcast to a batch."""
        return jnp.broadcast_to(
            self._bc(self._r, jnp.zeros((N_LIMBS,) + tuple(batch_shape))),
            (N_LIMBS,) + tuple(batch_shape),
        ).astype(U32)

    # ------------------------------------------------------- carry machinery

    @staticmethod
    def _carry16(cols):
        """Propagate carries over exactly N_LIMBS columns; returns (limbs, carry).

        ``cols`` is a list of N_LIMBS arrays with values < 2^31.
        """
        out = []
        c = jnp.zeros_like(cols[0])
        for i in range(N_LIMBS):
            v = cols[i] + c
            out.append(v & _MASK)
            c = v >> LIMB_BITS
        return out, c

    def _sub_limbs(self, a_cols, b_cols):
        """(a - b) limbwise with borrow chain; returns (limbs, borrow∈{0,1})."""
        out = []
        borrow = jnp.zeros_like(a_cols[0])
        base = np.uint32(1 << LIMB_BITS)
        for i in range(N_LIMBS):
            t = a_cols[i] + (base - b_cols[i]) - borrow
            out.append(t & _MASK)
            borrow = np.uint32(1) - (t >> LIMB_BITS)
        return out, borrow

    def _cond_sub_p(self, cols):
        """Reduce a value known to be < 2p into [0, p)."""
        p = [np.uint32(v) for v in self._p]
        diff, borrow = self._sub_limbs(cols, p)
        keep = borrow.astype(bool)  # borrow==1 → value < p → keep original
        return [jnp.where(keep, cols[i], diff[i]) for i in range(N_LIMBS)]

    @staticmethod
    def _unstack(a: jnp.ndarray):
        return [a[i] for i in range(N_LIMBS)]

    @staticmethod
    def _stack(cols) -> jnp.ndarray:
        return jnp.stack(cols, axis=0)

    # ------------------------------------------------------------ arithmetic

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        s = a + b  # limbs < 2^17
        cols, carry = self._carry16(self._unstack(s))
        del carry  # a,b < p < 2^255 so the 2^256 carry is always 0
        return self._stack(self._cond_sub_p(cols))

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        diff, borrow = self._sub_limbs(self._unstack(a), self._unstack(b))
        pb = jnp.asarray(self._p, U32)
        add_p = [
            diff[i] + borrow * jnp.broadcast_to(
                pb[i].reshape((1,) * borrow.ndim), borrow.shape
            )
            for i in range(N_LIMBS)
        ]
        cols, _ = self._carry16(add_p)
        return self._stack(cols)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(self.zeros(a.shape[1:]), a)

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product aR * bR -> abR (mod p)."""
        al = self._unstack(a)
        bl = self._unstack(b)
        zero = jnp.zeros(jnp.broadcast_shapes(al[0].shape, bl[0].shape), U32)
        cols = [zero] * (2 * N_LIMBS + 1)
        # full schoolbook product with lazy 16-bit split accumulation
        for i in range(N_LIMBS):
            ai = al[i]
            for j in range(N_LIMBS):
                prod = ai * bl[j]  # uint32 wrap-free: < 2^32
                cols[i + j] = cols[i + j] + (prod & _MASK)
                cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
        # interleaved Montgomery reduction
        nl = [np.uint32(v) for v in self._p]
        for i in range(N_LIMBS):
            m = (cols[i] * self._n0inv) & _MASK
            for j in range(N_LIMBS):
                prod = m * nl[j]
                cols[i + j] = cols[i + j] + (prod & _MASK)
                cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
            # cols[i] is now ≡ 0 mod 2^16; push its carry up and drop it
            cols[i + 1] = cols[i + 1] + (cols[i] >> LIMB_BITS)
        hi = cols[N_LIMBS : 2 * N_LIMBS]
        out, carry = self._carry16(hi)
        del carry  # result < 2p < 2^256 ⇒ no carry out
        return self._stack(self._cond_sub_p(out))

    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    # ------------------------------------------------------------ exponentiation

    def pow_const(self, a: jnp.ndarray, exponent: int) -> jnp.ndarray:
        """a^exponent for a host-constant exponent (square & multiply loop)."""
        bits = np.array([int(b) for b in bin(exponent)[2:]], dtype=np.int32)
        bits_d = jnp.asarray(bits)

        def body(i, acc):
            acc = self.mul(acc, acc)
            with_mul = self.mul(acc, a)
            take = (bits_d[i] == 1).reshape((1,) * acc.ndim)
            return jnp.where(take, with_mul, acc)

        acc0 = self.ones(a.shape[1:])
        return jax.lax.fori_loop(0, len(bits), body, acc0)

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Batched Fermat inversion; inv(0) = 0 (used for non-det witnesses)."""
        return self.pow_const(a, self.modulus - 2)

    # ------------------------------------------------------------ predicates

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=0)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=0)

    def select(self, mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
        """where(mask, a, b) with mask shaped like the batch."""
        return jnp.where(mask[None], a, b)

    # ------------------------------------------------------------ conversion

    def to_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, self._bc(self._r2, a))

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        one = jnp.zeros_like(a).at[0].set(1)
        return self.mul(a, one)

    # host <-> device helpers (non-jittable)

    def encode(self, ints, to_mont: bool = True) -> jnp.ndarray:
        """Python ints -> (16, N) Montgomery device array."""
        arr = np.asarray(
            [int_to_limbs(int(x) % self.modulus) for x in ints], dtype=np.uint32
        ).T  # (16, N)
        out = jnp.asarray(arr)
        return self.to_mont(out) if to_mont else out

    def encode_scalar(self, x: int, to_mont: bool = True) -> jnp.ndarray:
        return self.encode([x], to_mont=to_mont)[:, 0]

    def decode(self, arr: jnp.ndarray, from_mont: bool = True) -> list[int]:
        """(16, N) device array -> list of Python ints."""
        if from_mont:
            arr = self.from_mont(arr)
        host = np.asarray(jax.device_get(arr))
        flat = host.reshape(N_LIMBS, -1)
        return [limbs_to_int(flat[:, i]) for i in range(flat.shape[1])]


FP = Field(fp_params())
FQ = Field(fq_params())
