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


def test_proof_w16():
    """Real proof at W=16 / k=10 (reference proves at W ∈ {8,16,24} —
    circuits/mod.rs:415-505; round 1 only ever proved W=8)."""
    from tinyram_tpu.ipa import setup as _setup
    from tinyram_tpu.tinyram import TinyRamCircuit as _C

    circ = _C(16, 8)
    srs = _setup(circ.k)
    pk = circ.keygen(srs)
    prog = [
        I("Mov", ri=0, a=0xBEEF),
        I("Mull", ri=1, rj=0, a=0x123),
        I("Shr", ri=2, rj=1, a=5),
        I("Cmpg", ri=2, a=0x7FFF),
        I("CMov", ri=3, a=77),
        I("Answer", areg=2),
    ]
    tr = eval_program(prog, 16, 8)
    proof = circ.prove(srs, pk, tr)
    assert circ.verify(srs, pk, prog, tr.answer, proof)
    assert not circ.verify(srs, pk, prog, tr.answer + 1, proof)


@pytest.mark.skipif(
    "TINYRAM_TPU_TESTS" not in __import__("os").environ,
    reason="W=24/k=14 proof takes hours on CPU; run on TPU via "
    "scripts/bench_prover.py (which proves AND verifies config 2) or "
    "set TINYRAM_TPU_TESTS=1",
)
def test_proof_w24():
    from tinyram_tpu.ipa import setup as _setup
    from tinyram_tpu.tinyram import TinyRamCircuit as _C
    from tinyram_tpu.tinyram.bench_programs import config2_program

    circ = _C(24, 8)
    srs = _setup(circ.k)
    pk = circ.keygen(srs)
    tr = eval_program(config2_program(256), 24, 8)
    proof = circ.prove(srs, pk, tr)
    assert circ.verify(srs, pk, list(tr.prog), tr.answer, proof)
