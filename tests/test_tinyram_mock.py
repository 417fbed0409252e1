"""TinyRAM circuit mock-prover tests (tier-2 of the reference test strategy).

Programs mirror the reference's MockProver suites: the minimal Answer-only
trace (circuits/mod.rs:379-386), mov/answer (exe.rs:1117+), arithmetic and
bitwise mixes, shifts, signed compares, and memory load/store.
"""

import pytest

from tinyram_tpu.tinyram import Imm, Instruction, Reg, TinyRamCircuit, eval_program


def I(op, ri=None, rj=None, a=0, areg=None):
    return Instruction(op, ri, rj, Reg(areg) if areg is not None else Imm(a))


@pytest.fixture(scope="module")
def circ8():
    return TinyRamCircuit(8, 8)


def check(circ, prog, primary=(), aux=(), expect_answer=None):
    tr = eval_program(prog, circ.tcs.word_bits, circ.tcs.reg_count, primary, aux)
    if expect_answer is not None:
        assert tr.answer == expect_answer
    failures = circ.mock_prove(tr)
    assert failures == [], "\n".join(str(f) for f in failures[:10])
    return tr


def test_answer_only(circ8):
    check(circ8, [I("Answer", a=0)], expect_answer=0)


def test_mov_answer(circ8):
    check(circ8, [I("Mov", ri=2, a=55), I("Answer", areg=2)], expect_answer=55)


def test_bitwise_ops(circ8):
    check(circ8, [
        I("Mov", ri=0, a=0b10110101),
        I("And", ri=1, rj=0, a=0b11001100),
        I("Or", ri=2, rj=0, a=0b00001111),
        I("Xor", ri=3, rj=0, areg=2),
        I("Not", ri=4, a=0b01010101),
        I("Answer", areg=3),
    ])


def test_arith_ops(circ8):
    check(circ8, [
        I("Mov", ri=0, a=200),
        I("Add", ri=1, rj=0, a=100),      # carry
        I("Sub", ri=2, rj=0, a=250),      # borrow
        I("Mull", ri=3, rj=0, a=3),       # overflow word
        I("UMulh", ri=4, rj=0, a=3),
        I("SMulh", ri=5, rj=0, a=0xFF),   # signed: 200 is -56
        I("UDiv", ri=6, rj=0, a=7),
        I("UMod", ri=7, rj=0, a=7),
        I("Answer", areg=6),
    ])


def test_div_by_zero(circ8):
    check(circ8, [
        I("Mov", ri=0, a=9),
        I("UDiv", ri=1, rj=0, a=0),
        I("UMod", ri=2, rj=0, a=0),
        I("Answer", areg=1),
    ], expect_answer=0)


def test_compares_and_jumps(circ8):
    check(circ8, [
        I("Mov", ri=0, a=5),
        I("Cmpe", ri=0, a=5),
        I("CMov", ri=1, a=42),
        I("Cmpa", ri=0, a=9),      # 5 > 9 false
        I("CnJmp", a=6),           # taken
        I("Answer", a=1),
        I("Cmpae", ri=0, a=5),     # true
        I("Cmpg", ri=0, a=0xFF),   # 5 > -1 signed: true
        I("Cmpge", ri=0, a=5),
        I("CJmp", a=10),           # taken
        I("Answer", areg=1),
    ], expect_answer=42)


def test_shifts(circ8):
    check(circ8, [
        I("Mov", ri=0, a=0b10010110),
        I("Shl", ri=1, rj=0, a=3),
        I("Shr", ri=2, rj=0, a=3),
        I("Shl", ri=3, rj=0, a=0),    # shift by zero
        I("Shr", ri=4, rj=0, a=0),
        I("Shl", ri=5, rj=0, a=8),    # shift by W
        I("Shr", ri=6, rj=0, a=8),
        I("Shl", ri=7, rj=0, a=200),  # overshift
        I("Answer", areg=2),
    ])


def test_load_store(circ8):
    check(circ8, [
        I("LoadW", ri=0, a=0),
        I("And", ri=1, rj=0, a=0b1),
        I("StoreW", ri=1, a=8),
        I("LoadW", ri=2, a=8),
        I("Answer", areg=2),
    ], primary=[0b1], expect_answer=1)


def test_tampered_witness_fails(circ8):
    """Negative control: a corrupted register column must trip a gate."""
    import numpy as np

    from tinyram_tpu.plonk import MockProver
    from tinyram_tpu.tinyram.exe import exe_witness

    prog = [I("Mov", ri=2, a=55), I("Answer", areg=2)]
    tr = eval_program(prog, 8, 8)
    asg = circ8.assignment(tr)
    # corrupt reg2 on row 1 (the Answer row): claim r2 = 54
    col = circ8.tcs.col.advice["reg2"]
    vals = [0] * circ8.tcs.n
    vals[1] = 54
    asg.set(col, vals)
    failures = MockProver(circ8.tcs.cs, asg).verify()
    assert failures, "tampered witness not caught"


def test_wrong_answer_fails(circ8):
    from tinyram_tpu.plonk import MockProver
    from tinyram_tpu.tinyram.exe import instance_columns

    prog = [I("Answer", a=7)]
    tr = eval_program(prog, 8, 8)
    asg = circ8.assignment(tr)
    # lie about the public answer
    bad = instance_columns(circ8.tcs, prog, 8)
    asg.set(circ8.tcs.col.instance["answer"], bad["answer"])
    failures = MockProver(circ8.tcs.cs, asg).verify()
    assert any(f.name.startswith("answer_binding") for f in failures), failures


def test_memory_forgery_caught(circ8):
    """The Exe↔Mem link (our completion of the reference's unfinished memory
    story) must reject a forged load value."""
    import numpy as np

    from tinyram_tpu.plonk import MockProver

    prog = [
        I("LoadW", ri=0, a=0),
        I("StoreW", ri=0, a=8),
        I("LoadW", ri=1, a=8),
        I("Answer", areg=1),
    ]
    tr = eval_program(prog, 8, 8, primary_tape=[41])
    asg = circ8.assignment(tr)
    assert MockProver(circ8.tcs.cs, asg).verify() == []

    # tamper the Mem table: the final load "returns" 99
    from tinyram_tpu.field import FP

    col = circ8.tcs.col.advice["m_value"]
    vals = FP.decode(asg.get(col))
    loads = FP.decode(asg.get(circ8.tcs.col.advice["m_load"]))
    row = max(i for i, l in enumerate(loads) if l == 1)
    vals[row] = 99
    asg.set(col, np.array(vals, dtype=np.int64))
    failures = MockProver(circ8.tcs.cs, asg).verify()
    assert any(f.name in ("exe_mem", "mem_exe", "mem.table#3")
               for f in failures), failures


@pytest.mark.slow  # k=14 witness+mock (~135 s); W8/W16 mocks stay fast
def test_w24_mock():
    """BASELINE word size 24 (k=14, 4096-row tables) mock-proves."""
    circ = TinyRamCircuit(24, 8)
    check(circ, [
        I("Mov", ri=0, a=0xABCDEF),
        I("Mull", ri=1, rj=0, a=0x123456),
        I("Shr", ri=2, rj=1, a=13),
        I("Cmpg", ri=2, a=0x800001),
        I("Answer", areg=2),
    ])


def test_tape_binding(circ8):
    """Public-tape binding: init rows must match the primary-tape instance.

    Goes beyond the reference (whose Mem table is unlinked): the initial
    memory is pinned to the public tape — forged tape values, forged
    non-tape inits, and instance/witness tape mismatches are all caught.
    """
    import numpy as np

    from tinyram_tpu.field import FP
    from tinyram_tpu.plonk import MockProver
    from tinyram_tpu.tinyram.exe import instance_columns

    prog = [
        I("LoadW", ri=0, a=0),
        I("Add", ri=1, rj=0, a=1),
        I("Answer", areg=1),
    ]
    tr = eval_program(prog, 8, 8, primary_tape=[41])
    assert tr.answer == 42
    asg = circ8.assignment(tr)
    assert MockProver(circ8.tcs.cs, asg).verify() == []

    # (a) verifier supplies a different public tape -> lookups must fail
    bad = instance_columns(circ8.tcs, prog, 42, primary=[40])
    asg_bad = circ8.assignment(tr)
    for nm in ("t.act", "t.addr", "t.value"):
        asg_bad.set(circ8.tcs.col.instance[nm], bad[nm])
    failures = MockProver(circ8.tcs.cs, asg_bad).verify()
    assert any(f.name in ("tape_mem", "mem_tape") for f in failures), failures

    # (b) prover forges a nonzero init at a non-tape address
    asg_f = circ8.assignment(tr)
    row = int(np.max(np.nonzero(
        FP.decode(asg_f.get(circ8.tcs.col.advice["m_s_trace"]))))) + 1
    prev_addr = int(FP.decode(
        asg_f.get(circ8.tcs.col.advice["m_addr"]))[row - 1])
    inc = 9 - prev_addr - 1  # keep the sort gates satisfied
    from tinyram_tpu.tinyram.exe import decomp_even_odd
    ie, io = decomp_even_odd(np.array([inc]), 8)
    forged = {
        "m_s_trace": 1, "m_addr": 9, "m_init": 1, "m_value": 7,
        "m_addr_inc": inc, "m_addr_inc_e": int(ie[0]),
        "m_addr_inc_o": int(io[0]),
    }
    for nm, val in forged.items():
        col = circ8.tcs.col.advice[nm]
        vals = FP.decode(asg_f.get(col))
        vals[row] = val
        asg_f.set(col, np.array(vals, dtype=np.int64))
    failures = MockProver(circ8.tcs.cs, asg_f).verify()
    assert any("tape.init" in f.name for f in failures), failures

    # (c) prover claims the tape init row is in-tape with a wrong value
    asg_v = circ8.assignment(tr)
    col = circ8.tcs.col.advice["m_value"]
    vals = FP.decode(asg_v.get(col))
    inits = FP.decode(asg_v.get(circ8.tcs.col.advice["m_init"]))
    row = min(i for i, v in enumerate(inits) if v == 1)
    vals[row] = 99
    asg_v.set(col, np.array(vals, dtype=np.int64))
    failures = MockProver(circ8.tcs.cs, asg_v).verify()
    assert any(f.name.split("#")[0] in
               ("tape_mem", "mem_tape", "exe_mem", "mem_exe",
                "def.tm_value", "def.mm_value", "mem.table")
               for f in failures), failures

    # (d) coordinated attacker keeps the product columns consistent
    # (tm_value = it·m_value) — the two-way tape lookup itself must fail
    asg_w = circ8.assignment(tr)
    for nm in ("m_value", "tm_value"):
        col = circ8.tcs.col.advice[nm]
        vals = FP.decode(asg_w.get(col))
        vals[row] = 99
        asg_w.set(col, np.array(vals, dtype=np.int64))
    failures = MockProver(circ8.tcs.cs, asg_w).verify()
    assert any(f.name in ("tape_mem", "mem_tape", "exe_mem", "mem_exe")
               for f in failures), failures


def test_aux_tape_mock(circ8):
    """Aux tape: private words are free advice but confined to the public
    aux address region."""
    from tinyram_tpu.plonk import MockProver

    prog = [
        I("LoadW", ri=0, a=0),   # primary[0]
        I("LoadW", ri=1, a=8),   # aux[0] (addr = 1*W/8... word stride 1B @ W=8)
        I("Add", ri=2, rj=0, a=1),
        I("Answer", areg=2),
    ]
    # W=8 -> 1 byte per word: primary at addr 0, aux at addr 1
    tr = eval_program(prog, 8, 8, primary_tape=[10], aux_tape=[5])
    assert tr.aux_len == 1
    asg = circ8.assignment(tr)
    assert MockProver(circ8.tcs.cs, asg).verify() == []
