"""ctypes bridge to the native C++ TinyRAM emulator.

Compiled on first use with g++ (no pybind11 in the image — CPython-free C
ABI + ctypes per the environment constraints).  `eval_program_native`
returns the same columnar `Trace` as the Python emulator; tests assert
exact agreement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

from ..emulator import MemAccess, Trace
from ..isa import Imm, Instruction, Program

_LIB = None


class _Instr(ctypes.Structure):
    _fields_ = [
        ("op", ctypes.c_uint8),
        ("ri", ctypes.c_uint8),
        ("rj", ctypes.c_uint8),
        ("a_is_imm", ctypes.c_uint8),
        ("a", ctypes.c_uint64),
    ]


class _Access(ctypes.Structure):
    _fields_ = [
        ("address", ctypes.c_uint64),
        ("time", ctypes.c_uint64),
        ("value", ctypes.c_uint64),
        ("kind", ctypes.c_uint8),
    ]


def _build() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(os.path.dirname(__file__), "emulator.cpp")
    cache_dir = os.environ.get(
        "TINYRAM_TPU_CACHE", os.path.expanduser("~/.cache/tinyram_tpu")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so = os.path.join(cache_dir, "tinyram_emulator.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        tmp = so + ".tmp"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp],
            check=True,
        )
        os.replace(tmp, so)
    lib = ctypes.CDLL(so)
    lib.tinyram_run.restype = ctypes.c_long
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _build()
        return True
    except Exception:
        return False


def eval_program_native(
    prog: Program,
    word_bits: int,
    reg_count: int,
    primary_tape=(),
    aux_tape=(),
    max_steps: int = 1 << 22,
) -> Trace:
    lib = _build()
    L = len(prog)
    # same loud immediate-vs-word-size validation as the Python
    # eval_program (emulator.py): the C++ core masks immediates, but the
    # prog-table instance commits them raw — an out-of-range immediate
    # would yield a silently unsatisfiable witness (ADVICE r4)
    mask = (1 << word_bits) - 1
    for i, inst in enumerate(prog):
        if isinstance(inst.a, Imm) and not 0 <= inst.a.value <= mask:
            raise ValueError(
                f"program line {i} ({inst.op}): immediate "
                f"{inst.a.value:#x} does not fit word_bits={word_bits}"
            )
    instrs = (_Instr * L)()
    for i, inst in enumerate(prog):
        instrs[i].op = inst.opcode
        instrs[i].ri = inst.ri or 0
        instrs[i].rj = inst.rj or 0
        instrs[i].a_is_imm = 1 if isinstance(inst.a, Imm) else 0
        instrs[i].a = inst.immediate() if isinstance(inst.a, Imm) else inst.a.index

    tape = np.array(list(primary_tape) + list(aux_tape), dtype=np.uint64)
    M = max_steps
    pc = np.zeros(M, np.int64)
    opcode = np.zeros(M, np.int64)
    vaddr = np.zeros(M, np.int64)
    inst_index = np.zeros(M, np.int64)
    regs = np.zeros((M + 1) * reg_count, np.int64)
    flag = np.zeros(M + 1, np.int64)
    accs = (_Access * (len(tape) + 2 * M + 4))()
    acc_count = ctypes.c_long(0)
    answer = ctypes.c_int64(0)

    def ptr(arr):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    steps = lib.tinyram_run(
        instrs, L,
        tape.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(tape),
        word_bits, reg_count, M,
        ptr(pc), ptr(opcode), ptr(vaddr), ptr(inst_index), ptr(regs),
        ptr(flag), accs, ctypes.byref(acc_count), ctypes.byref(answer),
    )
    assert steps >= 0, "native emulator: program did not Answer"
    T = int(steps)
    accesses = [
        MemAccess(
            kind=("init", "store", "load")[accs[i].kind],
            address=int(accs[i].address),
            time=int(accs[i].time),
            value=int(accs[i].value),
        )
        for i in range(acc_count.value)
    ]
    return Trace(
        word_bits=word_bits,
        reg_count=reg_count,
        prog=prog,
        pc=pc[:T].copy(),
        opcode=opcode[:T].copy(),
        regs=regs[: (T + 1) * reg_count].reshape(T + 1, reg_count).copy(),
        flag=flag[: T + 1].copy(),
        v_addr=vaddr[:T].copy(),
        inst_index=inst_index[:T].copy(),
        accesses=accesses,
        answer=int(answer.value),
        primary_tape=tuple(int(w) for w in primary_tape),
        aux_len=len(list(aux_tape)),
    )
