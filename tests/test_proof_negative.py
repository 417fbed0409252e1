"""Per-gadget-family REAL-PROOF negative tests (round 5, VERDICT r4 #9).

The reference drives `gen_proofs_and_verify_should_fail` per gadget family
(/root/reference/src/test_utils.rs:73-119, used at logic.rs:514-527,
sum.rs:315-322, shift.rs:499-560): an invalid witness must yield a proof
the verifier REJECTS — mock-level rejection is not enough, the quotient /
lookup arguments themselves must catch it.

Here: for each of the 13 Out families, a forged activation bit on a
padding row plus a family-specific payload that violates exactly that
family's gate (payloads pre-validated against the mock prover — each
trips a failure named after its family; see the per-family comments).
The tampered assignment goes through the REAL create_proof and the
verifier must reject.  One W=8/k=6 pk serves all 13 (the jit cache makes
proofs after the first take seconds on CPU).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from tinyram_tpu.field import FP
from tinyram_tpu.ipa import setup
from tinyram_tpu.plonk import MockProver, create_proof
from tinyram_tpu.tinyram import Imm, Instruction, Reg, TinyRamCircuit, eval_program


def I(op, ri=None, rj=None, a=0, areg=None):
    return Instruction(op, ri, rj, Reg(areg) if areg is not None else Imm(a))


@pytest.fixture(scope="module")
def ctx():
    circ = TinyRamCircuit(8, 8)
    prog = [I("Mov", ri=2, a=55), I("Shr", ri=3, rj=2, a=2),
            I("Answer", areg=3)]
    tr = eval_program(prog, 8, 8)
    srs = setup(circ.k)
    pk = circ.keygen(srs)
    return circ, prog, tr, srs, pk


# (family, [(column, row_offset_from_pad_row, value), ...]) — row offsets
# are relative to the forged padding row (len(trace) + 1).  Each payload
# was searched against the mock prover to trip a failure whose gate name
# starts with the family name (logs/search_payloads_r5.log):
#   and/xor/or/prod/sprod forge the result temp var c;
#   sum/ssum/mod/shift/flag2/flag3 forge operand temp var a;
#   flag1 needs the activated flag_next AND a nonzero tv_c;
#   flag4 needs flag_next=1 with both shift-direction bits zero.
FAMILY_PAYLOADS = [
    ("and", [("tv_c", 0, 7)]),
    ("xor", [("tv_c", 0, 7)]),
    ("or", [("tv_c", 0, 7)]),
    ("sum", [("tv_a", 0, 5)]),
    ("ssum", [("tv_a", 0, 5)]),
    ("prod", [("tv_c", 0, 7)]),
    ("sprod", [("tv_c", 0, 7)]),
    ("mod", [("tv_a", 0, 5)]),
    ("shift", [("tv_a", 0, 5)]),
    ("flag1", [("tv_c", 0, 7), ("flag", 1, 1)]),
    ("flag2", [("tv_a", 0, 5)]),
    ("flag3", [("tv_a", 0, 5)]),
    ("flag4", [("flag", 1, 1)]),
]


def _forged_assignment(circ, tr, family, payload):
    row = len(tr) + 1
    asg = circ.assignment(tr)
    for name, off, value in [(f"out.{family}", 0, 1)] + payload:
        col = circ.tcs.col.advice[name]
        vals = FP.decode(asg.get(col))
        vals[row + off] = value
        asg.set(col, np.array(vals, dtype=object))
    return asg


@pytest.mark.parametrize("family,payload", FAMILY_PAYLOADS,
                         ids=[f for f, _ in FAMILY_PAYLOADS])
def test_forged_family_real_proof_rejected(ctx, family, payload):
    circ, prog, tr, srs, pk = ctx
    asg = _forged_assignment(circ, tr, family, payload)
    # precondition: the forgery actually violates this family's gate
    fails = MockProver(circ.tcs.cs, asg).verify()
    assert any(f.name.split("#")[0].split(".")[0].startswith(family)
               for f in fails), [f.name for f in fails]
    proof = create_proof(srs, pk, asg)
    assert not circ.verify(srs, pk, prog, tr.answer, proof), (
        f"forged {family} witness produced a VERIFYING proof"
    )


def test_clean_proof_accepted(ctx):
    """Control: the untampered witness proves and verifies."""
    circ, prog, tr, srs, pk = ctx
    proof = create_proof(srs, pk, circ.assignment(tr))
    assert circ.verify(srs, pk, prog, tr.answer, proof)
