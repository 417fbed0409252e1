"""Real-proof TinyRAM tests (tier-3: gen_proofs_and_verify equivalents)."""

import pytest

pytestmark = pytest.mark.slow  # full proofs take minutes on CPU

from tinyram_tpu.ipa import setup
from tinyram_tpu.tinyram import Imm, Instruction, Reg, TinyRamCircuit, eval_program


def I(op, ri=None, rj=None, a=0, areg=None):
    return Instruction(op, ri, rj, Reg(areg) if areg is not None else Imm(a))


@pytest.fixture(scope="module")
def setup8():
    circ = TinyRamCircuit(8, 8)
    srs = setup(circ.k)
    pk = circ.keygen(srs)
    return circ, srs, pk


def test_proof_answer_only(setup8):
    circ, srs, pk = setup8
    prog = [I("Answer", a=0)]
    tr = eval_program(prog, 8, 8)
    proof = circ.prove(srs, pk, tr)
    assert circ.verify(srs, pk, prog, 0, proof)
    # soundness: wrong claimed answer fails
    assert not circ.verify(srs, pk, prog, 1, proof)


def test_proof_two_programs_one_pk(setup8):
    """Two different traces verify under the same pk — mirrors the
    'two_programs' tests (circuits/mod.rs:377-405)."""
    circ, srs, pk = setup8
    prog1 = [I("Mov", ri=2, a=55), I("Add", ri=3, rj=2, a=200),
             I("Answer", areg=3)]
    prog2 = [I("Mov", ri=0, a=9), I("Shl", ri=1, rj=0, a=2),
             I("Xor", ri=2, rj=1, a=0xF0), I("Answer", areg=2)]
    for prog in (prog1, prog2):
        tr = eval_program(prog, 8, 8)
        proof = circ.prove(srs, pk, tr)
        assert circ.verify(srs, pk, prog, tr.answer, proof)

    # cross-check: prog1's proof must not verify against prog2's instance
    tr1 = eval_program(prog1, 8, 8)
    proof1 = circ.prove(srs, pk, tr1)
    assert not circ.verify(srs, pk, prog2, tr1.answer, proof1)


def test_proof_memory_program(setup8):
    circ, srs, pk = setup8
    prog = [
        I("LoadW", ri=0, a=0),
        I("Add", ri=1, rj=0, a=1),
        I("StoreW", ri=1, a=8),
        I("LoadW", ri=2, a=8),
        I("Answer", areg=2),
    ]
    tr = eval_program(prog, 8, 8, primary_tape=[41])
    assert tr.answer == 42
    proof = circ.prove(srs, pk, tr)
    assert circ.verify(srs, pk, prog, 42, proof, primary=[41])
    # tape binding: claiming a different public tape must fail
    assert not circ.verify(srs, pk, prog, 42, proof, primary=[40])
    assert not circ.verify(srs, pk, prog, 42, proof)
