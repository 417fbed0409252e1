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
  * Trace compactness is a first-class constraint: carry/borrow chains are
    `lax.scan`s and limb accumulation uses static pads, keeping one modmul
    at ~150 HLO ops so deep compositions (NTT stages, Fermat inversion,
    constraint evaluation) compile quickly.
  * Inversion is Fermat (x^(p-2)) via a square-and-multiply `fori_loop` —
    ~510 batched multiplies but fully parallel across the batch, unlike the
    serial Montgomery-batch-inversion trick which is hostile to SIMD.
  * No data-dependent shapes anywhere; everything jits and vmaps.

The reference delegates all of this to the Rust `pasta_curves`/halo2 fork
(see SURVEY.md "Native-component ledger"); this module is its TPU-native
replacement built from the primes up.
"""

from __future__ import annotations

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
_SHIFT = np.uint32(LIMB_BITS)


def _const_limbs(x: int) -> np.ndarray:
    return np.array(int_to_limbs(x), dtype=np.uint32)


def _pad_rows(x: jnp.ndarray, lo: int, total: int) -> jnp.ndarray:
    """Zero-pad along axis 0 so ``x`` occupies rows [lo, lo+len) of ``total``."""
    cfg = [(lo, total - lo - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, cfg)


class Field:
    """Vectorized modular arithmetic for one prime field.

    All public methods take/return uint32 arrays shaped ``(16, *batch)`` in
    Montgomery form unless stated otherwise.  Methods are plain jnp code so
    they can be called from inside jit/shard_map code.
    """

    def __init__(self, params: FieldParams):
        self.params = params
        self.modulus = params.modulus
        self._p = _const_limbs(params.modulus)
        self._n0inv = np.uint32(params.n0_inv)
        self._r = _const_limbs(params.r_mod_p)  # 1 in Montgomery form
        # jit the hot entry points so eager (non-jitted) callers don't pay
        # per-op dispatch for the ~150-op limb kernels; inside an enclosing
        # jit these wrappers are inlined and cost nothing.
        self.add = jax.jit(self.add)
        self.sub = jax.jit(self.sub)
        self.neg = jax.jit(self.neg)
        self.double = jax.jit(self.double)
        self._mul_jnp = jax.jit(self.mul)
        self.mul = jax.jit(self._mul_dispatch)
        self.square = jax.jit(self.square)
        self.inv = jax.jit(self.inv)
        self.to_mont = jax.jit(self.to_mont)
        self.from_mont = jax.jit(self.from_mont)
        self.pow_const = jax.jit(self.pow_const, static_argnums=1)

    # ---------------------------------------------------------------- shapes

    def zeros(self, batch_shape=()) -> jnp.ndarray:
        return jnp.zeros((N_LIMBS,) + tuple(batch_shape), U32)

    def ones(self, batch_shape=()) -> jnp.ndarray:
        """Montgomery one, broadcast to a batch."""
        one = jnp.asarray(self._r).reshape((N_LIMBS,) + (1,) * len(batch_shape))
        return jnp.broadcast_to(one, (N_LIMBS,) + tuple(batch_shape))

    def const(self, value: int, batch_ndim: int = 0) -> jnp.ndarray:
        """Host int -> Montgomery constant shaped (16, 1, 1, ...)."""
        x = (value % self.modulus) * self.params.r_mod_p % self.modulus
        return jnp.asarray(_const_limbs(x)).reshape(
            (N_LIMBS,) + (1,) * batch_ndim
        )

    # ------------------------------------------------------- carry machinery

    @staticmethod
    def _carry(cols: jnp.ndarray) -> jnp.ndarray:
        """Propagate carries along axis 0 (values < 2^31); drops final carry."""

        def step(c, col):
            v = col + c
            return v >> _SHIFT, v & _MASK

        _, out = jax.lax.scan(step, jnp.zeros_like(cols[0]), cols)
        return out

    @staticmethod
    def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray):
        """(a - b) limbwise with borrow chain; returns (limbs, borrow∈{0,1})."""
        base = np.uint32(1 << LIMB_BITS)

        def step(borrow, ab):
            ai, bi = ab
            t = ai + (base - bi) - borrow
            return np.uint32(1) - (t >> _SHIFT), t & _MASK

        b = jnp.broadcast_to(b, a.shape).astype(U32)
        borrow, out = jax.lax.scan(
            step, jnp.zeros_like(a[0]), (a, b)
        )
        return out, borrow

    def _cond_sub_p(self, limbs: jnp.ndarray) -> jnp.ndarray:
        """Reduce a value known to be < 2p into [0, p)."""
        p = jnp.asarray(self._p).reshape((N_LIMBS,) + (1,) * (limbs.ndim - 1))
        diff, borrow = self._sub_limbs(limbs, p)
        return jnp.where(borrow.astype(bool)[None], limbs, diff)

    # ------------------------------------------------------------ arithmetic

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self._cond_sub_p(self._carry(a + b))

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        diff, borrow = self._sub_limbs(a, b)
        p = jnp.asarray(self._p).reshape((N_LIMBS,) + (1,) * (diff.ndim - 1))
        return self._carry(diff + borrow[None] * p)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(self.zeros(a.shape[1:]), a)

    def double(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product aR * bR -> abR (mod p)."""
        total = 2 * N_LIMBS  # 32 accumulation columns
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        batch = shape[1:]
        acc = jnp.zeros((total,) + batch, U32)
        # accumulate per-lhs-limb: peak temporaries stay (16, *batch)
        # instead of one (16, 16, *batch) product tensor (at k=14 extended
        # domains that tensor is tens of GB)
        for i in range(N_LIMBS):
            prods = a[i][None] * b  # (16, *batch)
            acc = (
                acc
                + _pad_rows(prods & _MASK, i, total)
                + _pad_rows(prods >> _SHIFT, i + 1, total)
            )
        # interleaved Montgomery reduction
        nl = jnp.asarray(self._p).reshape((N_LIMBS,) + (1,) * len(batch))
        for i in range(N_LIMBS):
            m = (acc[i] * self._n0inv) & _MASK
            prod = m[None] * nl  # (16, *batch)
            acc = (
                acc
                + _pad_rows(prod & _MASK, i, total)
                + _pad_rows(prod >> _SHIFT, i + 1, total)
            )
            # acc[i] ≡ 0 mod 2^16 now; push its carry into acc[i+1]
            acc = acc.at[i + 1].add(acc[i] >> _SHIFT)
        out = self._carry(acc[N_LIMBS:])
        return self._cond_sub_p(out)

    def _mul_dispatch(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Route eligible multiplies to the fused Pallas kernel.

        Default ON for TPU backends (TINYRAM_NO_PALLAS=1 disables):
        identical operand shapes flatten to (16, lanes) and run the whole
        SOS Montgomery multiply in VMEM.  Everything else (broadcasts,
        small batches, non-TPU) takes the jnp path.
        """
        import os

        if (
            not os.environ.get("TINYRAM_NO_PALLAS")
            and jax.default_backend() == "tpu"
            and a.shape == b.shape
            and a.ndim >= 2
        ):
            lanes = 1
            for d in a.shape[1:]:
                lanes *= d
            if lanes >= 2048:
                for blk in (2048, 1024, 512, 256, 128):
                    if lanes % blk == 0:
                        from .pallas_mul import _mul_pallas

                        out = _mul_pallas(
                            a.reshape(N_LIMBS, lanes),
                            b.reshape(N_LIMBS, lanes),
                            field_name=self.params.name, block=blk,
                        )
                        return out.reshape(a.shape)
        return self.mul_jnp(a, b)

    def mul_jnp(self, a, b):
        return self._mul_jnp(a, b)

    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    # ---------------------------------------------------------------- powers

    def pow_const(self, a: jnp.ndarray, exponent: int) -> jnp.ndarray:
        """a^exponent for a host-constant exponent (square & multiply loop)."""
        bits = np.array([int(b) for b in bin(exponent)[2:]], dtype=np.int32)
        bits_d = jnp.asarray(bits)

        def body(i, acc):
            acc = self.mul(acc, acc)
            with_mul = self.mul(acc, a)
            take = (bits_d[i] == 1).reshape((1,) * acc.ndim)
            return jnp.where(take, with_mul, acc)

        acc0 = jnp.broadcast_to(
            jnp.asarray(self._r).reshape((N_LIMBS,) + (1,) * (a.ndim - 1)),
            a.shape,
        ).astype(U32)
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
        r2 = jnp.asarray(_const_limbs(self.params.r2_mod_p)).reshape(
            (N_LIMBS,) + (1,) * (a.ndim - 1)
        )
        return self.mul(a, r2)

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        one = jnp.zeros_like(a).at[0].set(1)
        return self.mul(a, one)

    # host <-> device helpers (non-jittable)

    def encode(self, ints, to_mont: bool = True) -> jnp.ndarray:
        """Python ints -> (16, N) Montgomery device array.

        Fast path: integer numpy arrays (non-object dtype) with values in
        [0, 2^63) are limb-split vectorized and Montgomery-converted with
        one device multiply — no per-value Python loop.
        """
        if isinstance(ints, np.ndarray) and ints.dtype != object and \
                ints.dtype.kind in "iu" and ints.ndim == 1 and \
                (ints.size == 0 or int(ints.min()) >= 0):
            vals = ints.astype(np.int64, copy=False)
            limbs = np.zeros((N_LIMBS, vals.shape[0]), dtype=np.uint32)
            for i in range(4):
                limbs[i] = (vals >> (16 * i)) & 0xFFFF
            dev = jnp.asarray(limbs)
            return self.to_mont(dev) if to_mont else dev
        factor = self.params.r_mod_p if to_mont else 1
        arr = np.asarray(
            [
                int_to_limbs(int(x) * factor % self.modulus)
                for x in ints
            ],
            dtype=np.uint32,
        ).T  # (16, N)
        return jnp.asarray(arr)

    def encode_scalar(self, x: int, to_mont: bool = True) -> jnp.ndarray:
        return self.encode([x], to_mont=to_mont)[:, 0]

    def decode(self, arr: jnp.ndarray, from_mont: bool = True) -> list[int]:
        """(16, N) device array -> list of Python ints."""
        if from_mont:
            arr = self.from_mont(arr)
        host = np.asarray(jax.device_get(arr))
        flat = host.reshape(N_LIMBS, -1)
        return [limbs_to_int(flat[:, i]) for i in range(flat.shape[1])]

    def decode_i64(self, arr: jnp.ndarray, from_mont: bool = True):
        """(16, N) device array -> int64 numpy array, or None if any value
        exceeds 62 bits (caller falls back to the bigint path)."""
        if from_mont:
            arr = self.from_mont(arr)
        host = np.asarray(jax.device_get(arr)).reshape(N_LIMBS, -1)
        if host[4:].any() or (host[3] >> 14).any():
            return None
        out = host[0].astype(np.int64)
        for i in range(1, 4):
            out |= host[i].astype(np.int64) << (16 * i)
        return out


FP = Field(fp_params())
FQ = Field(fq_params())
