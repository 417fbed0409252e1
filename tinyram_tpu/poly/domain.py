"""Evaluation domains for the PLONKish prover.

TPU-native replacement for halo2's `EvaluationDomain` (used by keygen and
`create_proof` in the reference's unvendored fork — SURVEY.md §2 L0).

A `Domain` owns the size-n subgroup H (circuit rows) and the extended coset
g·H_ext used for quotient evaluation.  The coset generator is the field's
multiplicative generator, which lies in no 2-power subgroup, so Z_H never
vanishes on the coset.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..field.jfield import FP, Field
from ..field.params import N_LIMBS
from .ntt import coeff_scale, ntt, omega_for, powers, tree_sum, _mont_table


class Domain:
    def __init__(self, field: Field, k: int, extended_k: int):
        assert extended_k >= k
        self.field = field
        self.k = k
        self.n = 1 << k
        self.extended_k = extended_k
        self.n_ext = 1 << extended_k
        p = field.modulus
        self.omega = omega_for(field, k)
        self.omega_inv = pow(self.omega, p - 2, p)
        self.omega_ext = omega_for(field, extended_k)
        self.g_coset = field.params.generator
        self.g_coset_inv = pow(self.g_coset, p - 2, p)

    # ------------------------------------------------------------ transforms

    def _ntt(self, a: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """Single-chip NTT, or the all-to-all 4-step sharded NTT when a
        mesh context is active (shard/context.py) and the size fits."""
        from ..shard.context import current_mesh

        mesh = current_mesh()
        if mesh is not None:
            from ..shard.ntt import _split_rc, ntt_sharded

            n = a.shape[-1]
            D = mesh.devices.size
            R, C = _split_rc(n.bit_length() - 1)
            if self.field.params.name == "Fp" and R % D == 0 and C % D == 0:
                return ntt_sharded(mesh, a, inverse, self.field)
        return ntt(self.field, a, inverse=inverse)

    def lagrange_to_coeff(self, a: jnp.ndarray) -> jnp.ndarray:
        """Evaluations on H (natural ω^i order) -> coefficients."""
        return self._ntt(a, True)

    def coeff_to_lagrange(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._ntt(a, False)

    def coeff_to_extended(self, a: jnp.ndarray) -> jnp.ndarray:
        """Coefficients (len n or less) -> evaluations on the coset g·H_ext."""
        pad = self.n_ext - a.shape[-1]
        if pad:
            a = jnp.concatenate(
                [a, self.field.zeros(a.shape[1:-1] + (pad,))], axis=-1
            )
        a = coeff_scale(self.field, a, self.g_coset)
        return self._ntt(a, False)

    def extended_to_coeff(self, a: jnp.ndarray) -> jnp.ndarray:
        """Evaluations on g·H_ext -> coefficients (length n_ext)."""
        a = self._ntt(a, True)
        return coeff_scale(self.field, a, self.g_coset_inv)

    # ---------------------------------------------------------- vanishing poly

    def divide_by_vanishing(self, evals_ext: jnp.ndarray) -> jnp.ndarray:
        """Divide coset-extended evaluations by Z_H(X) = X^n - 1.

        Z_H(g·ω_ext^i) = g^n·ω_ext^{n·i} - 1 cycles with period
        n_ext/n, so only that many inverses are needed (computed host-side).
        """
        p = self.field.modulus
        period = self.n_ext // self.n
        gn = pow(self.g_coset, self.n, p)
        wn = pow(self.omega_ext, self.n, p)  # order `period`
        vals = []
        cur = gn
        for _ in range(period):
            vals.append(pow(cur - 1, p - 2, p))
            cur = (cur * wn) % p
        tbl = _mont_table(self.field, vals)  # (16, period)
        reps = self.n_ext // period
        full = jnp.tile(tbl, (1, reps))
        # evals index i has Z_H^{-1}[i mod period]; tiling gives period-repeat
        # pattern [v0..v_{p-1}, v0..], which matches i mod period ordering.
        shape = (N_LIMBS,) + (1,) * (evals_ext.ndim - 2) + (self.n_ext,)
        return self.field.mul(evals_ext, full.reshape(shape))

    # ---------------------------------------------------------- host helpers

    def omega_powers(self) -> jnp.ndarray:
        """Device table of [1, ω, …, ω^{n-1}] (Montgomery)."""
        return powers(self.field, self.omega, self.n)

    def l0_evals_ext(self) -> np.ndarray:
        """Coset-extended evaluations of the first Lagrange basis poly l_0.

        l_0(X) = (X^n - 1) / (n (X - 1)).  Cached: host modpow loop.
        """
        if getattr(self, "_l0_ext", None) is not None:
            return self._l0_ext
        p = self.field.modulus
        vals = []
        x = self.g_coset
        for i in range(self.n_ext):
            num = (pow(x, self.n, p) - 1) % p
            den = (self.n * (x - 1)) % p
            vals.append(num * pow(den, p - 2, p) % p)
            x = (x * self.omega_ext) % p
        self._l0_ext = _mont_table(self.field, vals)
        return self._l0_ext

    def x_evals_ext(self) -> np.ndarray:
        """Evaluations of the identity polynomial X on the extended coset."""
        if getattr(self, "_x_ext", None) is not None:
            return self._x_ext
        p = self.field.modulus
        vals = []
        x = self.g_coset
        for i in range(self.n_ext):
            vals.append(x)
            x = (x * self.omega_ext) % p
        self._x_ext = _mont_table(self.field, vals)
        return self._x_ext

    def lagrange_sum_ext(self, rows: tuple) -> jnp.ndarray:
        """Coset-extended evaluations of Σ_{i∈rows} l_i(X), cached.

        Used for the ZK usable-rows machinery: l_last (= l_u) and the
        blinding-row selector Σ_{i≥u} l_i in the lookup/permutation rules.
        """
        cache = getattr(self, "_lsum_ext", None)
        if cache is None:
            cache = self._lsum_ext = {}
        key = tuple(rows)
        if key not in cache:
            ind = np.zeros(self.n, dtype=np.int64)
            ind[list(key)] = 1
            lag = jnp.asarray(_mont_table(self.field, ind.tolist()))
            cache[key] = self.coeff_to_extended(self.lagrange_to_coeff(lag))
        return cache[key]

    def lagrange_evals_host(self, x: int, indices) -> list[int]:
        """l_i(x) for a host point x (verifier side), exact Python ints."""
        p = self.field.modulus
        zx = (pow(x, self.n, p) - 1) % p
        out = []
        n_inv = pow(self.n, p - 2, p)
        for i in indices:
            wi = pow(self.omega, i, p)
            den = (x - wi) % p
            li = zx * wi % p * n_inv % p * pow(den, p - 2, p) % p
            out.append(li)
        return out


@lru_cache(maxsize=None)
def domain_cache(field_name: str, k: int, extended_k: int) -> Domain:
    from ..field.jfield import FP, FQ

    return Domain(FP if field_name == "Fp" else FQ, k, extended_k)
