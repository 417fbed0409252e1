"""Emulator tests replicating the reference trace.rs test suite."""

import numpy as np

from tinyram_tpu.tinyram import Imm, Instruction, Reg, eval_program
from tinyram_tpu.tinyram.isa import decode_signed


def I(op, ri=None, rj=None, a=0, areg=None):
    return Instruction(op, ri, rj, Reg(areg) if areg is not None else Imm(a))


def test_trace_load_and_store_ans():
    """trace.rs:565-601 (trace_load_and_store_ans_test)."""
    prog = [
        I("LoadW", ri=0, a=0),
        I("And", ri=1, rj=0, a=0b1),
        I("StoreW", ri=1, a=8),
        I("Answer", areg=1),
    ]
    tr = eval_program(prog, 8, 8, primary_tape=[0b1])
    assert tr.answer == 0b1
    stores = [a for a in tr.accesses if a.kind == "store"]
    assert stores == [
        next(a for a in tr.accesses if a.kind == "store")
    ]
    s = stores[0]
    assert (s.address, s.time, s.value) == (8, 3, 1)
    assert len(tr.accesses) == 4  # init 0, load 0, init 8, store 8


def test_trace_load_and_answer():
    """trace.rs:603-624."""
    prog = [
        I("LoadW", ri=0, a=16),
        I("And", ri=1, rj=0, a=128),
        I("Answer", a=1),
    ]
    tr = eval_program(prog, 8, 8, primary_tape=[0b1])
    assert len(tr.accesses) == 3  # init tape, init 16, load 16
    assert tr.answer == 1


def test_signed_decode():
    """trace.rs signed roundtrips (from_signed/to_signed proptests)."""
    for s in range(-128, 128):
        w = s & 0xFF
        assert decode_signed(w, 8) == s


def test_flag_semantics():
    """Spot-check the flag rules called out in SURVEY.md §2 L1."""
    # Add carry flag
    tr = eval_program([I("Mov", ri=0, a=255), I("Add", ri=1, rj=0, a=1),
                       I("Answer", areg=1)], 8, 8)
    assert tr.answer == 0 and tr.flag[2] == 1
    # Sub borrow flag: 3 - 5 borrows
    tr = eval_program([I("Mov", ri=0, a=3), I("Sub", ri=1, rj=0, a=5),
                       I("Answer", areg=1)], 8, 8)
    assert tr.answer == (3 - 5) % 256 and tr.flag[2] == 1
    # Mull flag: product fits
    tr = eval_program([I("Mov", ri=0, a=15), I("Mull", ri=1, rj=0, a=17),
                       I("Answer", areg=1)], 8, 8)
    assert tr.answer == 255 and tr.flag[2] == 1
    # UDiv by zero
    tr = eval_program([I("Mov", ri=0, a=9), I("UDiv", ri=1, rj=0, a=0),
                       I("Answer", areg=1)], 8, 8)
    assert tr.answer == 0 and tr.flag[2] == 1
    # Shl flag = old msb
    tr = eval_program([I("Mov", ri=0, a=0x80), I("Shl", ri=1, rj=0, a=1),
                       I("Answer", areg=1)], 8, 8)
    assert tr.answer == 0 and tr.flag[2] == 1
    # Cmpg signed
    tr = eval_program([I("Mov", ri=0, a=0xFF), I("Cmpg", ri=0, a=1),
                       I("CJmp", a=4), I("Answer", a=7), I("Answer", a=9)],
                      8, 8)
    assert tr.answer == 7  # -1 > 1 is false -> fall through


def test_jumps_and_cmov():
    prog = [
        I("Mov", ri=0, a=5),
        I("Cmpe", ri=0, a=5),     # flag = 1
        I("CMov", ri=1, a=42),    # taken
        I("CnJmp", a=0),          # not taken (flag=1) -> pc+1
        I("Jmp", a=5),
        I("Answer", areg=1),
    ]
    tr = eval_program(prog, 8, 8)
    assert tr.answer == 42
    assert list(tr.pc) == [0, 1, 2, 3, 4, 5]
