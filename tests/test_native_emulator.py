"""Native C++ emulator must agree exactly with the Python emulator."""

import random

import numpy as np
import pytest

from tinyram_tpu.tinyram import Imm, Instruction, Reg, eval_program
from tinyram_tpu.tinyram.isa import ALL_MNEMONICS, HAS_A_ONLY, HAS_RI_ONLY, HAS_RI_RJ
from tinyram_tpu.tinyram.native import eval_program_native, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable"
)


def I(op, ri=None, rj=None, a=0, areg=None):
    return Instruction(op, ri, rj, Reg(areg) if areg is not None else Imm(a))


def assert_traces_equal(t1, t2):
    assert t1.answer == t2.answer
    assert np.array_equal(t1.pc, t2.pc)
    assert np.array_equal(t1.opcode, t2.opcode)
    assert np.array_equal(t1.regs, t2.regs)
    assert np.array_equal(t1.flag, t2.flag)
    assert np.array_equal(t1.v_addr, t2.v_addr)
    a1 = [(a.kind, a.address, a.time, a.value) for a in t1.accesses]
    a2 = [(a.kind, a.address, a.time, a.value) for a in t2.accesses]
    assert a1 == a2


def test_native_matches_python_basic():
    prog = [
        I("LoadW", ri=0, a=0),
        I("Add", ri=1, rj=0, a=200),
        I("StoreW", ri=1, a=8),
        I("LoadW", ri=2, a=8),
        I("Shl", ri=3, rj=2, a=2),
        I("Cmpg", ri=3, a=5),
        I("CJmp", a=8),
        I("Answer", areg=3),
        I("Answer", areg=1),
    ]
    py = eval_program(prog, 8, 8, primary_tape=[99])
    nat = eval_program_native(prog, 8, 8, primary_tape=[99])
    assert_traces_equal(py, nat)


def test_native_matches_python_random_programs():
    """Randomized straight-line programs over the full ALU (no jumps so
    termination is trivial), word sizes 8 and 16."""
    rng = random.Random(1234)
    alu = sorted((HAS_RI_RJ | HAS_RI_ONLY) - {"LoadW", "StoreW", "CMov"})
    for wb in (8, 16):
        mask = (1 << wb) - 1
        for trial in range(10):
            prog = []
            for _ in range(rng.randrange(1, 30)):
                op = rng.choice(alu)
                ri = rng.randrange(8)
                rj = rng.randrange(8) if op in HAS_RI_RJ else None
                if rng.random() < 0.5:
                    a = Imm(rng.randrange(mask + 1))
                else:
                    a = Reg(rng.randrange(8))
                prog.append(Instruction(op, ri, rj, a))
            prog.append(I("Answer", areg=0))
            py = eval_program(prog, wb, 8)
            nat = eval_program_native(prog, wb, 8)
            assert_traces_equal(py, nat)


def test_native_long_trace_speed():
    """A 2^17-step loop runs through the native path quickly."""
    import time

    # r0 counts down from N; loop: Sub, CnJmp back
    N = 1 << 16
    prog = [
        I("Mov", ri=0, a=N & 0xFFFFFF),
        I("Sub", ri=0, rj=0, a=1),
        I("Cmpe", ri=0, a=0),
        I("CnJmp", a=1),
        I("Answer", a=0),
    ]
    t0 = time.time()
    nat = eval_program_native(prog, 24, 8, max_steps=1 << 20)
    dt = time.time() - t0
    assert nat.answer == 0
    assert len(nat) > 3 * N
    assert dt < 5.0, f"native emulator too slow: {dt}s"
