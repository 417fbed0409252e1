"""Per-gadget randomized positive + negative tests (VERDICT item 6).

Mirrors the reference's tier-2 proptest depth (logic.rs:453-943,
sum.rs:131-246, shift.rs:254-430, flag tests) the TPU-native way: instead
of per-case MockProver runs, each trial packs ~150 random single-gadget
instructions into ONE W=16 program (the prog table holds 256 lines) and
mock-proves the whole batch — every gadget × many random operands per
mock run.  Negative tests tamper each gadget's key witness column and
assert a named failure.
"""

import numpy as np
import pytest

from tinyram_tpu.field import FP
from tinyram_tpu.plonk import MockProver
from tinyram_tpu.tinyram import Imm, Instruction, Reg, TinyRamCircuit, eval_program


def I(op, ri=None, rj=None, a=0, areg=None):
    return Instruction(op, ri, rj, Reg(areg) if areg is not None else Imm(a))


@pytest.fixture(scope="module")
def circ16():
    return TinyRamCircuit(16, 8)


# ops grouped by the gadget families they exercise (aux/out.rs OUT rows)
BINARY_OPS = [
    "And", "Or", "Xor", "Add", "Sub", "Mull", "UMulh", "SMulh",
    "UDiv", "UMod", "Shl", "Shr",
]
UNARY_OPS = ["Not", "Mov", "CMov"]
CMP_OPS = ["Cmpe", "Cmpa", "Cmpae", "Cmpg", "Cmpge"]


def _random_program(rng, n_instr=150, word_bits=16):
    # the Prog table holds 2^(W/2) lines (prog.rs:137): W=8 caps at 16
    n_instr = min(n_instr, (1 << (word_bits // 2)) - 2)
    mask = (1 << word_bits) - 1
    prog = []
    # seed some registers with random values
    for r in range(8):
        prog.append(I("Mov", ri=r, a=int(rng.integers(0, mask + 1))))
    while len(prog) < n_instr:
        kind = rng.integers(0, 10)
        use_reg = bool(rng.integers(0, 2))
        operand = {}
        if use_reg:
            operand["areg"] = int(rng.integers(0, 8))
        else:
            # bias toward edge values: 0, 1, max, msb, random
            choices = [0, 1, mask, 1 << (word_bits - 1),
                       int(rng.integers(0, mask + 1)),
                       int(rng.integers(0, word_bits + 2))]
            operand["a"] = int(choices[rng.integers(0, len(choices))])
        if kind < 6:
            op = BINARY_OPS[rng.integers(0, len(BINARY_OPS))]
            prog.append(I(op, ri=int(rng.integers(0, 8)),
                          rj=int(rng.integers(0, 8)), **operand))
        elif kind < 8:
            op = CMP_OPS[rng.integers(0, len(CMP_OPS))]
            prog.append(I(op, ri=int(rng.integers(0, 8)), **operand))
        else:
            op = UNARY_OPS[rng.integers(0, len(UNARY_OPS))]
            prog.append(I(op, ri=int(rng.integers(0, 8)), **operand))
    prog.append(I("Answer", areg=0))
    return prog


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_random_gadget_batch(circ16, seed):
    rng = np.random.default_rng(seed)
    prog = _random_program(rng)
    tr = eval_program(prog, 16, 8)
    failures = circ16.mock_prove(tr)
    assert failures == [], "\n".join(str(f) for f in failures[:10])


# ---- negative tier: tamper each gadget family's result and expect its
# named gate/lookup to fail ---------------------------------------------

GADGET_CASES = [
    # (op, operands, tampered column, expected failure name prefixes)
    ("And", dict(ri=1, rj=0, a=0b1100), "tv_c", ("and", "tv.c")),
    ("Xor", dict(ri=1, rj=0, a=0b1010), "tv_c", ("xor", "tv.c")),
    ("Or", dict(ri=1, rj=0, a=0b0110), "tv_c", ("or", "tv.c")),
    ("Add", dict(ri=1, rj=0, a=77), "tv_c", ("sum", "tv.c")),
    ("Sub", dict(ri=1, rj=0, a=99), "tv_c", ("sum", "tv.c")),
    ("Mull", dict(ri=1, rj=0, a=301), "tv_d", ("prod", "tv.d")),
    ("UMulh", dict(ri=1, rj=0, a=301), "tv_c", ("prod", "tv.c")),
    ("SMulh", dict(ri=1, rj=0, a=0x8001), "tv_c", ("sprod", "tv.c", "signed")),
    ("UDiv", dict(ri=1, rj=0, a=7), "tv_c", ("mod", "tv.c")),
    ("UMod", dict(ri=1, rj=0, a=7), "tv_c", ("mod", "tv.c")),
    ("Shl", dict(ri=1, rj=0, a=3), "a_power", ("shift", "pow.")),
    ("Shr", dict(ri=1, rj=0, a=3), "a_power", ("shift", "pow.")),
    ("Cmpg", dict(ri=0, a=5), "msb_a", ("signed", "ssum")),
    ("Cmpe", dict(ri=0, a=5), "a_flag", ("flag2",)),
    ("UDiv", dict(ri=1, rj=0, a=9), "r", ("flag3", "decomp.r", "eb[")),
    ("Shr", dict(ri=1, rj=0, a=1), "lsb_b", ("flag4",)),
]


@pytest.mark.parametrize(
    "op,operands,column,expect", GADGET_CASES,
    ids=[f"{c[0]}-{c[2]}" for c in GADGET_CASES],
)
def test_gadget_tamper_caught(circ16, op, operands, column, expect):
    prog = [
        I("Mov", ri=0, a=0xA53C),
        I(op, **operands),
        I("Answer", a=1),
    ]
    tr = eval_program(prog, 16, 8)
    asg = circ16.assignment(tr)
    col = circ16.tcs.col.advice[column]
    vals = FP.decode(asg.get(col))
    vals[1] = (vals[1] + 1) % FP.modulus  # corrupt the gadget row
    asg.set(col, np.array(vals, dtype=object))
    failures = MockProver(circ16.tcs.cs, asg).verify()
    assert failures, f"tampered {column} on {op} row not caught"
    names = {f.name for f in failures}
    assert any(n.startswith(e) for n in names for e in expect), (
        f"expected one of {expect}, got {names}"
    )


# ---- round 3: word-size breadth + volume (VERDICT item 8).  The fast
# tier runs W=8 batches (k=6 compiles are cheap and shapes are shared with
# the other W=8 modules); the slow tier replays the reference's proptest
# depth: ~20 batches x W in {8, 16, 24}, ~150 random instructions each —
# every gadget family sees >1000 random operand pairs across word sizes.

@pytest.fixture(scope="module")
def circ8():
    return TinyRamCircuit(8, 8)


@pytest.mark.parametrize("seed", [3, 5, 7, 11, 13])
def test_random_gadget_batch_w8(circ8, seed):
    rng = np.random.default_rng(seed)
    prog = _random_program(rng, word_bits=8)
    tr = eval_program(prog, 8, 8)
    failures = circ8.mock_prove(tr)
    assert failures == [], "\n".join(str(f) for f in failures[:10])


@pytest.mark.slow
@pytest.mark.parametrize("word_bits,seed", [
    (w, s)
    for w in (8, 16, 24)
    for s in (101, 103, 107, 109, 113, 127, 131, 137, 139, 149,
              151, 157, 163, 167, 173, 179, 181, 191, 193, 197)
])
def test_random_gadget_batch_deep(word_bits, seed):
    circ = _deep_circ(word_bits)
    rng = np.random.default_rng(seed)
    prog = _random_program(rng, word_bits=word_bits)
    tr = eval_program(prog, word_bits, 8)
    failures = circ.mock_prove(tr)
    assert failures == [], "\n".join(str(f) for f in failures[:10])


_DEEP_CIRCS = {}


def _deep_circ(word_bits):
    if word_bits not in _DEEP_CIRCS:
        _DEEP_CIRCS[word_bits] = TinyRamCircuit(word_bits, 8)
    return _DEEP_CIRCS[word_bits]
