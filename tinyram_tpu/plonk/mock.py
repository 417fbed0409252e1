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

import jax.numpy as jnp
import numpy as np

from ..field.jfield import FP
from .circuit import Assignment, ConstraintSystem
from .expr import evaluate


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
    """Evaluate every gate poly over all rows; yields (gate, poly_idx, evals)."""
    tagged = [
        (g, pi, poly) for g in cs.gates for pi, poly in enumerate(g.polys)
    ]
    outs = _eval_exprs_lagrange([t[2] for t in tagged], asg)
    for (g, pi, _), out in zip(tagged, outs):
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

        # lookups (multiset check on host ints); columns whose values fit
        # int64 (the common case) decode vectorized, others fall back to
        # per-value bigints
        def _decode_col(dev):
            fast = FP.decode_i64(dev)
            return fast.tolist() if fast is not None else FP.decode(dev)

        u = self.cs.usable_rows(n)
        for lk in self.cs.lookups:
            cache: dict = {}
            in_vals = [
                _decode_col(_eval_expr_lagrange(e, asg, cache))
                for e in lk.inputs
            ]
            tb_vals = [
                _decode_col(_eval_expr_lagrange(e, asg, cache))
                for e in lk.tables
            ]
            table = set(zip(*tb_vals)) if tb_vals else set()
            # the lookup argument only covers the usable rows (ZK blinding
            # rows and the l_last row are excluded by the active factor)
            rows_in = list(zip(*(col[:u] for col in in_vals)))
            for row, tup in enumerate(rows_in):
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
        # usable row must be a member of the table column's usable rows
        for rl in self.cs.range_lookups:
            cache = {}
            t_vals = np.asarray(
                _decode_col(_eval_expr_lagrange(rl.table, asg, cache))[:u]
            )
            t_set = set(t_vals.tolist())
            for ei, e in enumerate(rl.inputs):
                vals = _decode_col(_eval_expr_lagrange(e, asg, cache))[:u]
                arr = np.asarray(vals)
                if arr.dtype != object and t_vals.dtype != object:
                    bad = ~np.isin(arr, t_vals)
                    rows = np.nonzero(bad)[0]
                else:
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
