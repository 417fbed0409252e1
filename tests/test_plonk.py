"""End-to-end PLONK core tests on a small hand-built circuit.

Exercises every argument the TinyRAM circuit needs: custom gates, instance
columns in gates, copy constraints (permutation argument), fixed-table
lookups, and dynamic-table lookups (advice table gated by a selector —
the fork's create_dynamic_table/lookup_dynamic shape, prog.rs:145-192).
"""

import pytest

from tinyram_tpu.field import FP
from tinyram_tpu.ipa import setup
from tinyram_tpu.plonk import (
    Assignment,
    ConstraintSystem,
    MockProver,
    create_proof,
    keygen,
    verify_proof,
)

K = 3
N = 1 << K
P = FP.modulus


def build_cs():
    cs = ConstraintSystem()
    q_mul = cs.fixed_column("q_mul")
    q_pub = cs.fixed_column("q_pub")
    q_rng = cs.fixed_column("q_rng")
    t_rng = cs.fixed_column("t_rng")  # fixed lookup table column
    a = cs.advice_column("a")
    b = cs.advice_column("b")
    c = cs.advice_column("c")
    d_tbl = cs.advice_column("d_tbl")  # dynamic table values
    s_tbl = cs.fixed_column("s_tbl")  # dynamic table selector
    q_dyn = cs.fixed_column("q_dyn")  # dynamic lookup input selector
    inst = cs.instance_column("pub")

    # a*b = c on rows where q_mul=1; c - next(c) relation exercises rotation
    cs.gate("mul", q_mul.cur() * (a.cur() * b.cur() - c.cur()))
    # public-input binding as a gate (instance columns usable directly)
    cs.gate("pub", q_pub.cur() * (a.cur() - inst.cur()))
    # fixed range lookup: q_rng·a ∈ t_rng
    cs.lookup("rng", [q_rng.cur() * a.cur()], [t_rng.cur()])
    # dynamic lookup: q_dyn·b ∈ {s_tbl·d_tbl}
    cs.lookup("dyn", [q_dyn.cur() * b.cur()], [s_tbl.cur() * d_tbl.cur()])
    # copy constraint through the permutation argument
    cs.copy(a, 2, c, 0)
    return cs, (q_mul, q_pub, q_rng, t_rng, a, b, c, d_tbl, s_tbl, q_dyn, inst)


def build_assignment(cs, cols, pub_val=7, tamper=None):
    (q_mul, q_pub, q_rng, t_rng, a, b, c, d_tbl, s_tbl, q_dyn, inst) = cols
    asg = Assignment(cs, N)
    # rows 0..3 multiply; row 0: a=7 (public), b=6, c=42; copy: a[2] = c[0]=42
    a_v = [7, 3, 42, 5, 0, 0, 0, 0]
    b_v = [6, 4, 1, 2, 9, 9, 0, 0]
    c_v = [42, 12, 42, 10, 0, 0, 0, 0]
    if tamper == "mul":
        c_v[1] = 13
    if tamper == "copy":
        a_v[2] = 41
        c_v[2] = 41  # keep the mul gate satisfied, break only the copy
    asg.set(q_mul, [1, 1, 1, 1, 0, 0, 0, 0])
    asg.set(q_pub, [1, 0, 0, 0, 0, 0, 0, 0])
    asg.set(q_rng, [1, 1, 1, 1, 0, 0, 0, 0])
    asg.set(t_rng, [7, 3, 42, 5, 0, 0, 0, 0])
    if tamper == "rng":
        asg.set(t_rng, [7, 3, 42, 4, 0, 0, 0, 0])
    asg.set(a, a_v)
    asg.set(b, b_v)
    asg.set(c, c_v)
    # dynamic table: rows 0..2 active with values {6, 4, 1, 2, 9}… need b's
    asg.set(d_tbl, [6, 4, 1, 2, 9, 0, 0, 0])
    asg.set(s_tbl, [1, 1, 1, 1, 1, 0, 0, 0])
    asg.set(q_dyn, [1, 1, 1, 1, 1, 1, 0, 0])
    if tamper == "dyn":
        asg.set(d_tbl, [6, 4, 1, 2, 8, 0, 0, 0])
    inst_v = [pub_val, 0, 0, 0, 0, 0, 0, 0]
    asg.set(inst, inst_v)
    return asg, inst_v


def test_mock_prover_ok_and_failures():
    cs, cols = build_cs()
    asg, _ = build_assignment(cs, cols)
    assert MockProver(cs, asg).verify() == []

    for tamper, kind in [("mul", "gate"), ("rng", "lookup"), ("dyn", "lookup"),
                         ("copy", "copy")]:
        bad, _ = build_assignment(cs, cols, tamper=tamper)
        failures = MockProver(cs, bad).verify()
        assert failures, f"tamper {tamper} undetected"
        assert any(f.kind == kind for f in failures), (tamper, failures)


@pytest.fixture(scope="module")
def proof_setup():
    cs, cols = build_cs()
    srs = setup(K)
    asg, inst_v = build_assignment(cs, cols)
    pk = keygen(srs, cs, asg)  # fixed columns from the same assignment
    return cs, cols, srs, pk, asg, inst_v


@pytest.mark.slow
def test_real_proof_roundtrip(proof_setup):
    cs, cols, srs, pk, asg, inst_v = proof_setup
    proof = create_proof(srs, pk, asg)
    assert verify_proof(srs, pk.vk, [inst_v], proof)


@pytest.mark.slow
def test_real_proof_soundness(proof_setup):
    cs, cols, srs, pk, asg, inst_v = proof_setup
    proof = create_proof(srs, pk, asg)
    # wrong public input must fail (mirrors gen_proofs_and_verify_should_fail)
    bad_inst = list(inst_v)
    bad_inst[0] = 8
    assert not verify_proof(srs, pk.vk, [bad_inst], proof)
    # corrupt proof byte must fail
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    assert not verify_proof(srs, pk.vk, [inst_v], bytes(bad))


@pytest.mark.slow
def test_real_proof_rejects_bad_witness(proof_setup):
    cs, cols, srs, pk, _, _ = proof_setup
    bad_asg, inst_v = build_assignment(cs, cols, tamper="mul")
    proof = create_proof(srs, pk, bad_asg)
    assert not verify_proof(srs, pk.vk, [inst_v], proof)
