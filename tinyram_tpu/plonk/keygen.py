"""Keygen: fixed-column and permutation-sigma commitments (vk/pk).

Replaces `keygen_vk`/`keygen_pk` from the reference's fork
(/root/reference/src/test_utils.rs:23-25).  The permutation argument follows
vanilla PLONK: cells are labelled δ^j·ω^i (column j, row i), copy constraints
merge label cycles, and σ_j polynomials encode the resulting permutation.
δ = g^{2^s} (g the field generator, s the 2-adicity) so the m column cosets
δ^j·H are pairwise disjoint.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..curve.host import AffinePoint
from ..field.jfield import FP
from ..ipa import SRS, commit
from ..poly.domain import Domain
from ..poly.ntt import _mont_table
from .circuit import Assignment, Column, ConstraintSystem

P = FP.modulus


def delta() -> int:
    par = FP.params
    return pow(par.generator, 1 << par.two_adicity, P)


@dataclass
class VerifyingKey:
    cs: ConstraintSystem
    k: int
    extended_k: int
    fixed_commitments: list[AffinePoint]
    sigma_commitments: list[AffinePoint]
    perm_columns: list[Column]

    def absorb_into(self, t) -> None:
        for c in self.fixed_commitments:
            t.common_point(c)
        for c in self.sigma_commitments:
            t.common_point(c)


@dataclass
class ProvingKey:
    vk: VerifyingKey
    domain: Domain
    fixed_lag: list[jnp.ndarray]
    fixed_coeff: list[jnp.ndarray]
    sigma_lag: list[jnp.ndarray]
    sigma_coeff: list[jnp.ndarray]


def build_permutation_sigmas(
    cs: ConstraintSystem, n: int
) -> tuple[list[Column], list[np.ndarray]]:
    """Cycle-merge copy constraints into σ_j value tables (host ints)."""
    cols = cs.permutation_columns()
    col_pos = {c: j for j, c in enumerate(cols)}
    # mapping[(j, i)] = (j', i'): start as identity, merge cycles by swapping
    mapping = {}
    for j in range(len(cols)):
        for i in range(n):
            mapping[(j, i)] = (j, i)
    for (a, ar), (b, br) in cs.copies:
        ja, jb = col_pos[a], col_pos[b]
        mapping[(ja, ar)], mapping[(jb, br)] = (
            mapping[(jb, br)],
            mapping[(ja, ar)],
        )
    d = delta()
    omega = None
    sigmas = []
    # σ_j(ω^i) = δ^{j'}·ω^{i'} where mapping[(j,i)] = (j', i')
    from ..poly.ntt import omega_for

    omega = omega_for(FP, n.bit_length() - 1)
    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * omega % P
    delta_pows = [pow(d, j, P) for j in range(len(cols))]
    for j in range(len(cols)):
        vals = np.empty(n, dtype=object)
        for i in range(n):
            jp, ip = mapping[(j, i)]
            vals[i] = delta_pows[jp] * omega_pows[ip] % P
        sigmas.append(vals)
    return cols, sigmas


def keygen(
    srs: SRS, cs: ConstraintSystem, fixed_assignment: Assignment
) -> ProvingKey:
    """Build pk/vk.  ``fixed_assignment`` must have all fixed columns set."""
    k = srs.k
    n = 1 << k
    assert fixed_assignment.n == n
    extended_k = k + cs.extension_factor_log2()
    domain = Domain(FP, k, extended_k)

    from ..ipa.ipa import commit_many

    fixed_lag = []
    for i in range(cs.num_fixed):
        v = fixed_assignment.fixed[i]
        fixed_lag.append(v if v is not None else FP.zeros((n,)))
    perm_cols, sigma_tables = build_permutation_sigmas(cs, n)
    sigma_lag = [
        jnp.asarray(_mont_table(FP, [int(v) for v in tbl]))
        for tbl in sigma_tables
    ]
    all_lag = jnp.stack(fixed_lag + sigma_lag, axis=1)
    all_coeff = domain.lagrange_to_coeff(all_lag)
    all_comms = commit_many(
        srs, [all_coeff[:, i] for i in range(all_coeff.shape[1])]
    )
    nf = len(fixed_lag)
    fixed_coeff = [all_coeff[:, i] for i in range(nf)]
    fixed_commitments = all_comms[:nf]
    sigma_coeff = [all_coeff[:, nf + j] for j in range(len(sigma_lag))]
    sigma_commitments = all_comms[nf:]

    vk = VerifyingKey(
        cs=cs,
        k=k,
        extended_k=extended_k,
        fixed_commitments=fixed_commitments,
        sigma_commitments=sigma_commitments,
        perm_columns=perm_cols,
    )
    return ProvingKey(
        vk=vk,
        domain=domain,
        fixed_lag=fixed_lag,
        fixed_coeff=fixed_coeff,
        sigma_lag=sigma_lag,
        sigma_coeff=sigma_coeff,
    )
