"""Replay of the reference's proptest regression corpus.

The reference commits shrunken proptest failures under
/root/reference/proptest-regressions/ (SURVEY.md §4: "these double as
regression corpora the TPU build can replay").  Each historical (a, b)
failure case is replayed through every gadget family in the full
TinyRamCircuit at the fitting word size, checked by the mock prover.
"""

import pytest

from tinyram_tpu.tinyram import Imm, Instruction, Reg, TinyRamCircuit, eval_program

# shrunken cases from proptest-regressions/{circuits,gadgets}/*.txt
PAIRS = sorted(
    {
        (0, 0), (0, 1), (0, 2), (0, 21), (0, 38), (0, 84), (0, 85),
        (0, 121), (8, 1), (79, 0), (143, 0), (233, 0),
        (0, 256), (0, 276), (17641, 0), (26055, 0),
    }
)
# shift regression: word = 0, shift_bits = 0 (circuits/shift.txt)
SHIFT_CASES = [(0, 0), (0, 1)]


def _alu_program(a, b):
    """Drive every gadget family with operands (a, b)."""
    return [
        Instruction("Mov", 0, None, Imm(a)),
        Instruction("Mov", 1, None, Imm(b)),
        Instruction("And", 2, 0, Reg(1)),
        Instruction("Or", 2, 0, Reg(1)),
        Instruction("Xor", 2, 0, Reg(1)),
        Instruction("Not", 2, None, Reg(1)),
        Instruction("Add", 2, 0, Reg(1)),
        Instruction("Sub", 2, 0, Reg(1)),
        Instruction("Mull", 2, 0, Reg(1)),
        Instruction("UMulh", 2, 0, Reg(1)),
        Instruction("SMulh", 2, 0, Reg(1)),
        Instruction("UDiv", 2, 0, Reg(1)),
        Instruction("UMod", 2, 0, Reg(1)),
        Instruction("Cmpe", 0, None, Reg(1)),
        Instruction("Cmpa", 0, None, Reg(1)),
        Instruction("Cmpae", 0, None, Reg(1)),
        Instruction("Cmpg", 0, None, Reg(1)),
        Instruction("Cmpge", 0, None, Reg(1)),
        Instruction("Answer", None, None, Reg(2)),
    ]


@pytest.fixture(scope="module")
def circ16():
    return TinyRamCircuit(16, 8)


def test_regression_pairs_w16(circ16):
    """All corpus pairs fit in 16-bit words; one combined replay run."""
    for a, b in PAIRS:
        prog = _alu_program(a, b)
        tr = eval_program(prog, 16, 8)
        failures = circ16.mock_prove(tr)
        assert failures == [], (a, b, [str(f) for f in failures[:5]])


def test_regression_shift_cases(circ16):
    for word, shift_bits in SHIFT_CASES:
        prog = [
            Instruction("Mov", 0, None, Imm(word)),
            Instruction("Shl", 1, 0, Imm(shift_bits)),
            Instruction("Shr", 2, 0, Imm(shift_bits)),
            Instruction("Answer", None, None, Reg(1)),
        ]
        tr = eval_program(prog, 16, 8)
        failures = circ16.mock_prove(tr)
        assert failures == [], (word, shift_bits,
                                [str(f) for f in failures[:5]])
