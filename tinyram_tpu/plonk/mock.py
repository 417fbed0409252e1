"""Mock prover: constraint evaluation without cryptography.

Replaces halo2's `MockProver::run` + `assert_satisfied` (the workhorse of
the reference test suite — SURVEY.md §3.2).  Evaluates every gate on the
full witness arrays on-device in one vectorized pass per gate, checks
lookups as multisets, and copy constraints directly.  Reports per-gate
per-row failures by name, like the reference relies on for debugging
(lib.rs:16-30 `leak_once` exists only to give gates static names).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..field.jfield import FP
from ..field.params import N_LIMBS
from .circuit import Assignment, ConstraintSystem
from .expr import evaluate


def _decode_cols_i64(cols: list[jnp.ndarray]):
    """Decode a list of (16, n) Montgomery columns to one (B, n) int64
    array in a single from_mont + device fetch, or None if any value
    exceeds 62 bits (caller falls back to per-value bigints).  The r4 mock
    decoded 35+ columns one python-list at a time — the dominant cost of
    the k=17 config-3 mock (588 s, VERDICT r4 weak 8)."""
    stack = FP.from_mont(jnp.stack(cols, axis=1))  # (16, B, n)
    host = np.asarray(jax.device_get(stack))
    if host[4:].any() or (host[3] >> 14).any():
        return None
    out = host[0].astype(np.int64)
    for i in range(1, 4):
        out |= host[i].astype(np.int64) << (16 * i)
    return out  # (B, n)


def _rows_member(rows: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Vectorized multiset membership of (u, k) int64 row tuples in a
    (t, k) table, via a void byte-view (np.isin sorts, so this is
    O((u+t)·log) instead of the old per-row python set probe)."""
    r = np.ascontiguousarray(rows)
    t = np.ascontiguousarray(table)
    if t.shape[0] == 0:
        return np.zeros(r.shape[0], dtype=bool)
    void = np.dtype((np.void, r.dtype.itemsize * r.shape[1]))
    rv = r.view(void).ravel()
    tv = t.view(void).ravel()
    return np.isin(rv, tv)


@dataclass
class Failure:
    kind: str  # "gate" | "lookup" | "copy"
    name: str
    detail: str

    def __str__(self):
        return f"[{self.kind}] {self.name}: {self.detail}"


def _rolled(arr: jnp.ndarray, rotation: int) -> jnp.ndarray:
    if rotation == 0:
        return arr
    # rotation +1 means "next row": value at row i is arr[i+1 mod n]
    return jnp.roll(arr, -rotation, axis=-1)


def _eval_exprs_lagrange(exprs, asg: Assignment, cache: dict | None = None):
    """Batched lagrange-domain evaluation (see prover._eval_exprs_on)."""
    from .prover import _eval_exprs_on

    def get_col(kind, index):
        base = getattr(asg, kind)[index]
        assert base is not None, f"unassigned {kind}[{index}]"
        return base

    return _eval_exprs_on(exprs, get_col, asg.n, 1, cache)


def _eval_expr_lagrange(expr, asg: Assignment, cache: dict):
    return _eval_exprs_lagrange([expr], asg, cache)[0]


def eval_gates_lagrange(cs: ConstraintSystem, asg: Assignment):
    """Evaluate every gate poly over all rows; yields (gate, poly_idx, evals).

    Expression batches are capped at ~2^25 total elements: at k=21 the
    all-at-once batch built (16, ~300, 2^21) stacks and the host OOM
    killer took the process at 72 GB (config-4 mock, r5).  Small circuits
    still evaluate in one fully-batched pass."""
    tagged = [
        (g, pi, poly) for g in cs.gates for pi, poly in enumerate(g.polys)
    ]
    chunk = max(1, (1 << 25) // max(asg.n, 1))
    for lo in range(0, len(tagged), chunk):
        sub = tagged[lo : lo + chunk]
        outs = _eval_exprs_lagrange([t[2] for t in sub], asg)
        for (g, pi, _), out in zip(sub, outs):
            yield g, pi, out


class MockProver:
    def __init__(self, cs: ConstraintSystem, asg: Assignment):
        self.cs = cs
        self.asg = asg

    def verify(self) -> list[Failure]:
        failures: list[Failure] = []
        asg = self.asg
        n = asg.n
        asg.finalize()

        # gates
        for g, pi, evals in eval_gates_lagrange(self.cs, asg):
            nz = np.asarray(jnp.logical_not(FP.is_zero(evals)))
            if nz.any():
                rows = np.nonzero(nz)[0][:8].tolist()
                failures.append(
                    Failure(
                        "gate",
                        f"{g.name}#{pi}",
                        f"nonzero at rows {rows}"
                        + ("…" if nz.sum() > 8 else ""),
                    )
                )

        # lookups: every (input expr tuple) row must appear in the table
        # multiset.  All expressions of a lookup evaluate in ONE batched
        # pass, decode in ONE device fetch, and the tuple membership is a
        # vectorized sorted-merge; values beyond 62 bits fall back to the
        # bigint path (rare: gate-degree tricks keep lookup values small)
        u = self.cs.usable_rows(n)
        for lk in self.cs.lookups:
            cache: dict = {}
            k_in = len(lk.inputs)
            devs = _eval_exprs_lagrange(list(lk.inputs) + list(lk.tables),
                                        asg, cache)
            fast = _decode_cols_i64(devs)
            if fast is not None:
                rows_in = fast[:k_in, :u].T  # (u, k)
                tb_rows = fast[k_in:, :].T   # (n, k) — table spans all rows,
                # matching the pre-r5 mock (selector-gated table exprs zero
                # out non-table rows themselves)
                ok = _rows_member(rows_in, tb_rows)
                bad = np.nonzero(~ok)[0]
                if len(bad):
                    r0 = int(bad[0])
                    failures.append(
                        Failure(
                            "lookup",
                            lk.name,
                            f"input row {r0} = {tuple(rows_in[r0].tolist())}"
                            " not in table",
                        )
                    )
            else:
                in_vals = [FP.decode(d) for d in devs[:k_in]]
                tb_vals = [FP.decode(d) for d in devs[k_in:]]
                table = set(zip(*tb_vals)) if tb_vals else set()
                rows_iter = list(zip(*(col[:u] for col in in_vals)))
                for row, tup in enumerate(rows_iter):
                    if tup not in table:
                        failures.append(
                            Failure(
                                "lookup",
                                lk.name,
                                f"input row {row} = {tup} not in table",
                            )
                        )
                        break

        # range lookups (LogUp arguments): every input value on every
        # usable row must be a member of the table column's usable rows.
        # One batched eval + one decode for table + all inputs.
        for rl in self.cs.range_lookups:
            cache = {}
            devs = _eval_exprs_lagrange([rl.table] + list(rl.inputs),
                                        asg, cache)
            fast = _decode_cols_i64(devs)
            if fast is not None:
                t_vals = fast[0, :u]
                for ei in range(len(rl.inputs)):
                    vals = fast[1 + ei, :u]
                    rows = np.nonzero(~np.isin(vals, t_vals))[0]
                    if len(rows):
                        r0 = int(rows[0])
                        failures.append(
                            Failure(
                                "lookup",
                                f"{rl.name}[{ei}]",
                                f"input row {r0} = {int(vals[r0])}"
                                " not in table",
                            )
                        )
            else:
                t_list = FP.decode(devs[0])[:u]
                t_set = set(t_list)
                for ei in range(len(rl.inputs)):
                    vals = FP.decode(devs[1 + ei])[:u]
                    rows = [r for r, v in enumerate(vals) if v not in t_set]
                    if len(rows):
                        r0 = int(rows[0])
                        failures.append(
                            Failure(
                                "lookup",
                                f"{rl.name}[{ei}]",
                                f"input row {r0} = {vals[r0]} not in table",
                            )
                        )

        # copy constraints
        for (a, ar), (b, br) in self.cs.copies:
            va = FP.decode(asg.get(a)[:, ar : ar + 1])[0]
            vb = FP.decode(asg.get(b)[:, br : br + 1])[0]
            if va != vb:
                failures.append(
                    Failure(
                        "copy",
                        f"{a.kind}[{a.index}]@{ar} = {b.kind}[{b.index}]@{br}",
                        f"{va} != {vb}",
                    )
                )

        return failures

    def assert_satisfied(self) -> None:
        failures = self.verify()
        if failures:
            msg = "\n".join(str(f) for f in failures[:20])
            raise AssertionError(f"mock prover found failures:\n{msg}")
