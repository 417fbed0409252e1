"""Randomized-program mock tests — the proptest tier of the reference suite.

The reference drives each gadget with proptest-generated operands
(SURVEY.md §4 tier 2, e.g. logic.rs:453-943, exe.rs:1117-1572); here random
whole programs exercise all gadgets through the full TinyRamCircuit at word
sizes 8 and 16, checked by the mock prover against the emulator.
"""

import random

import pytest

from tinyram_tpu.tinyram import Imm, Instruction, Reg, TinyRamCircuit, eval_program
from tinyram_tpu.tinyram.isa import HAS_RI_ONLY, HAS_RI_RJ


def random_program(rng: random.Random, word_bits: int, max_len: int):
    """Straight-line random program over the full ALU + memory, ending in
    a jump-free Answer (termination guaranteed)."""
    mask = (1 << word_bits) - 1
    ops = sorted((HAS_RI_RJ | HAS_RI_ONLY) - {"CMov"})
    prog = []
    for _ in range(rng.randrange(1, max_len)):
        op = rng.choice(ops)
        ri = rng.randrange(8)
        rj = rng.randrange(8) if op in HAS_RI_RJ else None
        if op in ("LoadW", "StoreW"):
            a = Imm(rng.randrange(0, 16))  # keep addresses small
        elif rng.random() < 0.5:
            a = Imm(rng.randrange(mask + 1))
        else:
            a = Reg(rng.randrange(8))
        prog.append(Instruction(op, ri, rj, a))
        if op == "Cmpe" and rng.random() < 0.3:
            prog.append(Instruction("CMov", rng.randrange(8), None, Imm(7)))
    table_len = 1 << (word_bits // 2)
    prog = prog[: table_len - 2]  # trace (incl. Answer) must fit the table
    prog.append(Instruction("Answer", None, None, Reg(0)))
    return prog


@pytest.mark.parametrize("word_bits,trials,max_len", [(8, 6, 12), (16, 2, 40)])
def test_random_programs_mock(word_bits, trials, max_len):
    circ = TinyRamCircuit(word_bits, 8)
    rng = random.Random(4242 + word_bits)
    for trial in range(trials):
        prog = random_program(rng, word_bits, max_len)
        tape = [rng.randrange((1 << word_bits)) for _ in range(2)]
        tr = eval_program(prog, word_bits, 8, primary_tape=tape,
                          max_steps=circ.tcs.table_len - 1)
        failures = circ.mock_prove(tr)
        assert failures == [], (
            f"trial {trial}: {[str(f) for f in failures[:5]]}\n"
            + "\n".join(str(i) for i in prog)
        )
