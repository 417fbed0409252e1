"""Memory-consistency table tests (mirrors mem.rs:322-443 mock suites)."""

import numpy as np
import pytest

from tinyram_tpu.plonk import MockProver
from tinyram_tpu.tinyram import Imm, Instruction, Reg, eval_program
from tinyram_tpu.tinyram.mem import MemCS


def I(op, ri=None, rj=None, a=0, areg=None):
    return Instruction(op, ri, rj, Reg(areg) if areg is not None else Imm(a))


def trace_with_memory():
    prog = [
        I("LoadW", ri=0, a=0),
        I("Add", ri=1, rj=0, a=1),
        I("StoreW", ri=1, a=8),
        I("LoadW", ri=2, a=8),
        I("StoreW", ri=2, a=0),
        I("Answer", areg=2),
    ]
    return eval_program(prog, 8, 8, primary_tape=[41])


def test_mem_mock_ok():
    mcs = MemCS(8)
    tr = trace_with_memory()
    asg = mcs.witness(tr)
    assert MockProver(mcs.cs, asg).verify() == []


def test_mem_mock_rejects_value_change_on_load():
    mcs = MemCS(8)
    tr = trace_with_memory()
    asg = mcs.witness(tr)
    # flip the value of a load row: must break the load-preserves-value rule
    vals = asg.get(mcs.advice["value"])
    loads = np.nonzero(np.array(
        [int(v) for v in _decode_col(asg, mcs, "load")]))[0]
    row = int(loads[-1])
    ints = _decode_col(asg, mcs, "value")
    ints[row] = (ints[row] + 1) % 251
    asg.set(mcs.advice["value"], np.array(ints, dtype=np.int64))
    failures = MockProver(mcs.cs, asg).verify()
    assert failures, "tampered load value not caught"


def test_mem_mock_rejects_unsorted_addresses():
    mcs = MemCS(8)
    tr = trace_with_memory()
    asg = mcs.witness(tr)
    addr = _decode_col(asg, mcs, "address")
    # swap two adjacent-cycle rows of different addresses without fixing
    # the increments
    j = next(i for i in range(1, len(addr)) if addr[i] != addr[i - 1])
    addr[j - 1], addr[j] = addr[j], addr[j - 1]
    asg.set(mcs.advice["address"], np.array(addr, dtype=np.int64))
    failures = MockProver(mcs.cs, asg).verify()
    assert failures, "unsorted memory table not caught"


def _decode_col(asg, mcs, name):
    from tinyram_tpu.field import FP

    return FP.decode(asg.get(mcs.advice[name]))
