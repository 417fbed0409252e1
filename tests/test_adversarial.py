"""Adversarial soundness tests: forged-selector / trace-island attacks.

Each test mutates an otherwise-valid witness the way a malicious prover
would and asserts the mock prover reports a named failure (VERDICT round-1
item 5: `s_trace` booleanness, trace islands, forged direction bits).
"""

import numpy as np
import pytest

from tinyram_tpu.field import FP
from tinyram_tpu.plonk import MockProver
from tinyram_tpu.tinyram import Imm, Instruction, Reg, TinyRamCircuit, eval_program


def I(op, ri=None, rj=None, a=0, areg=None):
    return Instruction(op, ri, rj, Reg(areg) if areg is not None else Imm(a))


@pytest.fixture(scope="module")
def circ8():
    return TinyRamCircuit(8, 8)


@pytest.fixture(scope="module")
def base(circ8):
    prog = [I("Mov", ri=2, a=55), I("Shr", ri=3, rj=2, a=2), I("Answer", areg=3)]
    tr = eval_program(prog, 8, 8)
    return prog, tr


def _mutate(circ, tr, name, row, value):
    asg = circ.assignment(tr)
    col = circ.tcs.col.advice[name]
    vals = FP.decode(asg.get(col))
    vals[row] = value
    asg.set(col, np.array(vals, dtype=object))
    return MockProver(circ.tcs.cs, asg).verify()


def test_clean_baseline(circ8, base):
    _, tr = base
    asg = circ8.assignment(tr)
    assert MockProver(circ8.tcs.cs, asg).verify() == []


def test_trace_island(circ8, base):
    """s_trace restarting after a gap must trip contiguous_trace."""
    _, tr = base
    failures = _mutate(circ8, tr, "s_trace", len(tr) + 2, 1)
    assert any(f.name.startswith("contiguous_trace") for f in failures), failures


def test_nonboolean_s_trace(circ8, base):
    _, tr = base
    failures = _mutate(circ8, tr, "s_trace", 0, 2)
    assert any(f.name.startswith("contiguous_trace") for f in failures), failures


def test_trace_island_with_forged_opcode(circ8, base):
    """Round-1 gap: opcode = p - 2^32 + 31 on the gap row re-enabled islands
    under the old single-gate formulation.  Must now be caught."""
    _, tr = base
    T = len(tr)
    asg = circ8.assignment(tr)
    p = FP.modulus
    for name, row, value in [
        ("opcode", T, p - (1 << 32) + 31),
        ("s_trace", T + 1, 1),
    ]:
        col = circ8.tcs.col.advice[name]
        vals = FP.decode(asg.get(col))
        vals[row] = value
        asg.set(col, np.array(vals, dtype=object))
    failures = MockProver(circ8.tcs.cs, asg).verify()
    assert any(f.name.startswith("contiguous_trace") for f in failures), failures


def test_early_trace_end_non_answer(circ8, base):
    """Ending the trace on a non-Answer row must fail (exe.rs:146 TODO,
    implemented here)."""
    _, tr = base
    failures = _mutate(circ8, tr, "s_trace", 1, 0)
    assert failures, "early trace end not caught"


def test_forged_shift_right_bit(circ8, base):
    """shift_right is bound to the opcode through the Out lookup; flipping
    it on a Shr row (to use the mod-pow table) must fail."""
    _, tr = base
    asg = circ8.assignment(tr)
    for name, value in [("shift_right", 0), ("shift_left", 1)]:
        col = circ8.tcs.col.advice[name]
        vals = FP.decode(asg.get(col))
        vals[1] = value  # the Shr row
        asg.set(col, np.array(vals, dtype=object))
    failures = MockProver(circ8.tcs.cs, asg).verify()
    assert any(f.name == "out" or f.name.startswith("shift")
               for f in failures), failures


def test_forged_is_load_bit(circ8):
    prog = [I("LoadW", ri=0, a=0), I("Answer", areg=0)]
    tr = eval_program(prog, 8, 8, primary_tape=[9])
    failures = _mutate(circ8, tr, "is_load", 0, 0)
    assert any(f.name in ("out", "mem.gate_def", "exe_mem", "mem_exe")
               for f in failures), failures


# ---- forged gating bits per de-gated lookup family (round 3, VERDICT
# weak #8): the degree-5 de-gating argument says a forged activation bit on
# a tr = 0 row only ADDS a membership constraint.  These tests forge each
# family's gating bit together with an out-of-table payload and assert the
# added membership constraint really is enforced (the prover cannot use a
# forged activation to inject arbitrary tuples).


def _mutate_many(circ, tr, updates):
    asg = circ.assignment(tr)
    for name, row, value in updates:
        col = circ.tcs.col.advice[name]
        vals = FP.decode(asg.get(col))
        vals[row] = value
        asg.set(col, np.array(vals, dtype=object))
    return MockProver(circ.tcs.cs, asg).verify()


def test_forged_pow_left_gating(circ8, base):
    """shift_left forged on a padding row with an out-of-table pow key."""
    _, tr = base
    row = len(tr) + 1
    failures = _mutate_many(
        circ8, tr,
        [("shift_left", row, 1), ("pow_key", row, 8 + 5), ("a_power", row, 3)],
    )
    assert any(f.name.startswith("pow.left") for f in failures), failures


def test_forged_pow_right_gating(circ8, base):
    _, tr = base
    row = len(tr) + 1
    failures = _mutate_many(
        circ8, tr,
        [("shift_right", row, 1), ("pow_key", row, 8 + 4), ("a_power", row, 1)],
    )
    assert any(f.name.startswith("pow.right") for f in failures), failures


def test_forged_mem_gate_on_padding_row(circ8, base):
    """s_mem_g forged beyond the trace: the Exe-side tuple (1, addr, t, v,
    is_store) has no Mem-table counterpart."""
    _, tr = base
    row = len(tr) + 1
    failures = _mutate_many(
        circ8, tr,
        [("s_mem_g", row, 1), ("address", row, 77), ("is_store", row, 1)],
    )
    assert any(
        f.name in ("exe_mem", "mem_exe") or f.name.startswith("st_pad")
        or f.name.startswith("mem.") for f in failures
    ), failures


def test_forged_in_tape_bit(circ8, base):
    """m_in_tape forged on an empty Mem row: (1, addr, value) must appear
    in the public tape instance, which is empty here."""
    _, tr = base
    row = len(tr) + 2
    failures = _mutate_many(
        circ8, tr,
        [("m_in_tape", row, 1), ("tm_addr", row, 55)],
    )
    assert any(
        f.name in ("tape_mem", "mem_tape") or f.name.startswith("mem.")
        for f in failures
    ), failures


def test_forged_in_aux_bit(circ8, base):
    """m_in_aux forged with an address outside the aux-tape region."""
    _, tr = base
    row = len(tr) + 2
    failures = _mutate_many(
        circ8, tr,
        [("m_in_aux", row, 1), ("au_addr", row, 200)],
    )
    assert any(
        f.name == "mem_aux" or f.name.startswith("mem.") for f in failures
    ), failures


def test_forged_out_bit_activates_checked_gadget(circ8, base):
    """The de-gating safety argument (exe.py _build_lookups docstring):
    forging an activation bit on a padding row can only ADD constraints.
    A lone forged out.sum with an all-zero payload is vacuously satisfied
    (and that is sound); the same forgery with a payload violating the
    activated gate must be caught."""
    _, tr = base
    row = len(tr) + 1
    # vacuous case: all-zero temps satisfy the activated sum gate
    assert _mutate_many(circ8, tr, [("out.sum", row, 1)]) == []
    # payload case: the activated gate is genuinely enforced
    failures = _mutate_many(
        circ8, tr, [("out.sum", row, 1), ("tv_a", row, 5)]
    )
    assert any(
        f.name.startswith("sum") or f.name.startswith("decomp")
        for f in failures
    ), failures
