"""Large-trace capability (VERDICT round-1 item 4 / BASELINE configs 3-5).

The reference caps traces at 2^(W/2) − 1 rows (exe.rs:104-106).  Here the
row count is decoupled: TinyRamCircuit(W, R, k=...) gives 2^k rows with the
same 2^(W/2) range table, and the witness math is 64-bit-safe at W = 32.
"""

import numpy as np
import pytest

from tinyram_tpu.tinyram import Imm, Instruction, Reg, TinyRamCircuit, eval_program
from tinyram_tpu.tinyram.exe import TinyRamCS, exe_witness


def I(op, ri=None, rj=None, a=0, areg=None):
    return Instruction(op, ri, rj, Reg(areg) if areg is not None else Imm(a))


def _loop_prog(iters):
    return [
        I("Add", ri=0, rj=0, a=1),
        I("Cmpe", ri=0, a=iters),
        I("CnJmp", a=0),
        I("Answer", areg=0),
    ]


@pytest.mark.slow
def test_decoupled_capacity_beyond_word_limit():
    """W=16, k=12: a 901-step trace (old cap was 255) mock-proves."""
    circ = TinyRamCircuit(16, 8, k=12)
    assert circ.k == 12
    tr = eval_program(_loop_prog(300), 16, 8)
    assert len(tr) == 901
    assert tr.answer == 300
    failures = circ.mock_prove(tr)
    assert failures == [], "\n".join(str(f) for f in failures[:10])


def test_capacity_assertion_still_enforced():
    circ = TinyRamCircuit(8, 8)  # default k=6: capacity = usable-2
    cap = circ.tcs.st_rows - 1
    tr = eval_program(_loop_prog(40), 8, 8)  # 121 steps > 55?  depends
    if len(tr) > cap:
        with pytest.raises(AssertionError):
            exe_witness(circ.tcs, tr)
    else:
        assert exe_witness(circ.tcs, tr)


def test_w32_witness_math_exact():
    """W=32 witness identities on the overflow-prone ops, checked with
    exact Python ints (the round-1 int64 overflow at exe.py prod_full)."""
    W = 32
    tcs = TinyRamCS(W, 8)  # k=18; witness build only (no mock: 2^18 rows)
    big = 0xFFFF_FFFB
    prog = [
        I("Mov", ri=0, a=big),
        I("Mull", ri=1, rj=0, a=0xFFFF_FFF1),
        I("UMulh", ri=2, rj=0, a=0xFFFF_FFF1),
        I("SMulh", ri=3, rj=0, a=0x8000_0005),
        I("Shl", ri=4, rj=0, a=31),
        I("Shr", ri=5, rj=0, a=29),
        I("Answer", areg=1),
    ]
    tr = eval_program(prog, W, 8)
    cols = exe_witness(tcs, tr)
    M = 1 << W

    def tv(name, row):
        return int(cols[name][row])

    # emulator ground truth for the product
    full = big * 0xFFFF_FFF1
    assert tr.regs[2][1] == full % M and tr.regs[3][2] == full // M

    # prod gate (prod.rs:62-74): a·b = d + 2^W·c on the Mull row (row 1)
    assert tv("tv_a", 1) * tv("tv_b", 1) == tv("tv_d", 1) + M * tv("tv_c", 1)
    # and on the UMulh row (row 2)
    assert tv("tv_a", 2) * tv("tv_b", 2) == tv("tv_d", 2) + M * tv("tv_c", 2)

    # sprod (sprod.rs): σ(a)·σ(b) = d + 2^W·σ(c) — signed via msb columns
    def signed(v, row, val):
        return val - int(cols[f"msb_{v}"][row]) * M

    r3 = 3
    assert signed("a", r3, tv("tv_a", r3)) * signed("b", r3, tv("tv_b", r3)) \
        == tv("tv_d", r3) + M * signed("c", r3, tv("tv_c", r3))

    # shift rows (shift.rs:112-165): a_power·b = d + 2^W·c
    for row in (4, 5):
        assert tv("a_power", row) * tv("tv_b", row) \
            == tv("tv_d", row) + M * tv("tv_c", row)
    # Shl result: reg4 after row 4
    assert tr.regs[5][4] == (big << 31) % M
    assert tr.regs[6][5] == big >> 29
