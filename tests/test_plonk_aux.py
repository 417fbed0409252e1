"""Batch verifier, layout dumps, pk serialization tests."""

import os
import tempfile

import pytest

from tinyram_tpu.ipa import setup
from tinyram_tpu.plonk import (
    BatchVerifier,
    create_proof,
    keygen,
    layout_dot,
    layout_summary,
    load_pk,
    save_pk,
    verify_proof,
)


@pytest.fixture(scope="module")
def small_circuit():
    from tests.test_plonk import K, build_assignment, build_cs

    cs, cols = build_cs()
    srs = setup(K)
    asg, inst_v = build_assignment(cs, cols)
    pk = keygen(srs, cs, asg)
    return cs, cols, srs, pk, asg, inst_v


@pytest.mark.slow
def test_batch_verifier(small_circuit):
    cs, cols, srs, pk, asg, inst_v = small_circuit
    proof = create_proof(srs, pk, asg)
    bv = BatchVerifier()
    bv.add_proof([inst_v], proof)
    bv.add_proof([inst_v], proof)
    assert bv.finalize(srs, pk.vk)
    # one corrupted proof: batch fails, detailed pinpoints which
    bad = bytearray(proof)
    bad[7] ^= 0xFF
    bv.add_proof([inst_v], bytes(bad))
    assert not bv.finalize(srs, pk.vk)
    assert bv.finalize_detailed(srs, pk.vk) == [True, True, False]


def test_layout_dumps(small_circuit):
    cs = small_circuit[0]
    text = layout_summary(cs)
    assert "columns:" in text and "gate mul#0" in text
    dot = layout_dot(cs)
    assert dot.startswith("digraph") and "mul" in dot


@pytest.mark.slow  # full keygen+prove+verify roundtrip (~460 s on CPU)
def test_pk_serialization_roundtrip(small_circuit):
    cs, cols, srs, pk, asg, inst_v = small_circuit
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "pk.npz")
        save_pk(path, pk)
        pk2 = load_pk(path, cs)
    assert pk2.vk.fixed_commitments == pk.vk.fixed_commitments
    assert pk2.vk.sigma_commitments == pk.vk.sigma_commitments
    # a proof made with the reloaded pk verifies against the original vk
    proof = create_proof(srs, pk2, asg)
    assert verify_proof(srs, pk.vk, [inst_v], proof)


def test_tinyram_layout_smoke():
    from tinyram_tpu.tinyram import TinyRamCircuit

    circ = TinyRamCircuit(8, 8)
    text = layout_summary(circ.tcs.cs)
    assert "lookup prog" in text
    # keep the printed degree in sync with the constraint system (the
    # Exe↔Mem lookups raised it from 5 to 8)
    assert f"required degree: {circ.tcs.cs.required_degree()}" in text
