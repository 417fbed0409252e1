"""Direct per-gadget operand-space sweeps (VERDICT r3 item 8).

The reference drives each gadget circuit over its operand space with
targeted proptest strategies (/root/reference/src/circuits/logic.rs:453-943,
shift.rs:254-430, sum.rs:131-246).  Random 150-instruction programs
(test_gadgets_random.py) under-sample gadget edge cases; here each family
gets a *crafted* operand grid — shift counts 0..W+2, UDiv/UMod with
engineered quotient/remainder edges (divide-by-zero, exact multiples,
remainder = divisor−1), signed boundaries ±2^(W−1), carry/borrow
boundaries, bit patterns — packed into few programs (2 instructions per
case: `Mov rj, b; Op ri, rj, a`) and mock-proved in one vectorized pass
per program.

Fast tier: one W=16 program per family (~120 operand pairs each).
Slow tier: the full grid at W ∈ {8, 16, 24} — ≥1000 pairs per family.
"""

import numpy as np
import pytest

from tinyram_tpu.tinyram import Imm, Instruction, Reg, TinyRamCircuit, eval_program


def I(op, ri=None, rj=None, a=0, areg=None):
    return Instruction(op, ri, rj, Reg(areg) if areg is not None else Imm(a))


_CIRCS = {}


def _circ(w):
    if w not in _CIRCS:
        _CIRCS[w] = TinyRamCircuit(w, 8)
    return _CIRCS[w]


def _edges(w, rng, extra=()):
    """Edge values of the W-bit operand space plus a few randoms."""
    mask = (1 << w) - 1
    msb = 1 << (w - 1)
    vals = {0, 1, 2, 3, mask, mask - 1, msb, msb - 1, msb + 1,
            mask >> 1, *extra}
    vals |= {int(rng.integers(0, mask + 1)) for _ in range(6)}
    return sorted(v & mask for v in vals)


def _family_pairs(family, w, rng, budget):
    """Crafted (a, b) operand pairs for one gadget family (op rj=b, A=a)."""
    mask = (1 << w) - 1
    msb = 1 << (w - 1)
    pairs = []
    if family == "shift":
        # every shift count 0..W+2 (incl. >= W saturation) x value edges
        for cnt in range(w + 3):
            for b in _edges(w, rng):
                pairs.append((cnt, b))
    elif family == "divmod":
        divisors = [0, 1, 2, 3, mask, msb, msb - 1] + [
            int(rng.integers(1, mask + 1)) for _ in range(4)
        ]
        for d in divisors:
            for q in _edges(w, rng):
                if d == 0:
                    pairs.append((0, q))  # divide-by-zero on every edge
                    continue
                exact = (q * d) & mask
                pairs.append((d, exact))            # remainder 0
                pairs.append((d, (exact + d - 1) & mask))  # rem = d-1
                pairs.append((d, int(rng.integers(0, mask + 1))))
    elif family == "signed":
        es = _edges(w, rng, extra=(msb - 2, msb + 2))
        for a in es:
            for b in es:
                pairs.append((a, b))
    elif family == "sum":
        es = _edges(w, rng)
        for a in es:
            for b in es:
                pairs.append((a, b))  # includes carry/borrow boundaries
    elif family == "prod":
        # products straddling the 2^W overflow boundary
        for a in _edges(w, rng):
            for b in _edges(w, rng):
                pairs.append((a, b))
            if a > 1:
                just_fit = mask // a
                pairs.append((a, just_fit))
                pairs.append((a, (just_fit + 1) & mask))
    elif family == "logic":
        pats = [0, mask, 0xAAAAAAAA & mask, 0x55555555 & mask]
        pats += [1 << i for i in range(0, w, max(1, w // 8))]
        pats += [int(rng.integers(0, mask + 1)) for _ in range(4)]
        for a in pats:
            for b in pats:
                pairs.append((a, b))
    rng.shuffle(pairs)
    return pairs[:budget]


FAMILY_OPS = {
    "logic": ["And", "Or", "Xor", "Cmpe"],
    "sum": ["Add", "Sub", "Cmpa", "Cmpae"],
    "signed": ["Cmpg", "Cmpge", "SMulh"],
    "prod": ["Mull", "UMulh"],
    "divmod": ["UDiv", "UMod"],
    "shift": ["Shl", "Shr"],
}


def _run_family(family, w, budget, seed):
    """Pack the family's operand grid into programs and mock-prove each."""
    rng = np.random.default_rng(seed)
    pairs = _family_pairs(family, w, rng, budget)
    ops = FAMILY_OPS[family]
    cap = (1 << (w // 2)) - 2  # prog table lines (prog.rs:137) minus Answer
    per_prog = max(1, cap // 2)  # 2 instructions per case
    total = 0
    i = 0
    while i < len(pairs):
        chunk = pairs[i : i + per_prog]
        i += per_prog
        prog = []
        cmp_ops = {"Cmpe", "Cmpa", "Cmpae", "Cmpg", "Cmpge"}
        for j, (a, b) in enumerate(chunk):
            op = ops[(total + j) % len(ops)]
            prog.append(I("Mov", ri=1, a=b))
            if op in cmp_ops:  # compares take (ri, A) only (trace.rs:491-507)
                prog.append(I(op, ri=1, a=a))
            else:
                prog.append(I(op, ri=2, rj=1, a=a))
        prog.append(I("Answer", a=0))
        tr = eval_program(prog, w, 8)
        failures = _circ(w).mock_prove(tr)
        assert failures == [], (
            f"{family} W={w} pairs {chunk[:4]}...: "
            + "\n".join(str(f) for f in failures[:10])
        )
        total += len(chunk)
    return total


@pytest.mark.parametrize("family", sorted(FAMILY_OPS))
def test_operand_sweep_w16(family):
    n = _run_family(family, 16, budget=120, seed=616)
    assert n >= 100


@pytest.mark.slow
@pytest.mark.parametrize("family", sorted(FAMILY_OPS))
def test_operand_sweep_deep(family):
    """≥1000 crafted operand pairs per family across W ∈ {8, 16, 24}."""
    total = 0
    total += _run_family(family, 8, budget=80, seed=808)
    total += _run_family(family, 16, budget=400, seed=816)
    total += _run_family(family, 24, budget=600, seed=824)
    assert total >= 1000, f"{family}: only {total} operand pairs swept"
