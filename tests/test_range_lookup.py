"""LogUp range-lookup argument: mock, prove/verify, and soundness tamper.

The range lookup replaces k independent single-column plookups (the
reference's per-gadget even-bits range checks, even_bits.rs:158-170) with
one log-derivative argument (see plonk/circuit.py RangeLookup).
"""

import jax.numpy as jnp
import numpy as np
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

P = FP.modulus
K = 6
N = 1 << K


def _build(n_inputs=5):
    """n_inputs advice columns, each range-checked against t_rng (0..15)."""
    cs = ConstraintSystem()
    t_rng = cs.fixed_column("t_rng")
    cols = [cs.advice_column(f"x{i}") for i in range(n_inputs)]
    cs.blinding_factors = 4
    cs.range_lookup("rng", [c.cur() for c in cols], t_rng.cur())
    return cs, t_rng, cols


def _assign(cs, t_rng, cols, vals_fn):
    u = cs.usable_rows(N)
    asg = Assignment(cs, N)
    asg.set(t_rng, [i % 16 for i in range(N)])
    for ci, c in enumerate(cols):
        asg.set(c, [vals_fn(ci, r) for r in range(u)] + [0] * (N - u))
    return asg


def test_range_lookup_mock_ok():
    cs, t_rng, cols = _build()
    asg = _assign(cs, t_rng, cols, lambda ci, r: (3 * ci + r) % 16)
    MockProver(cs, asg).assert_satisfied()


def test_range_lookup_mock_catches_out_of_range():
    cs, t_rng, cols = _build()
    asg = _assign(
        cs, t_rng, cols, lambda ci, r: 77 if (ci, r) == (2, 5) else r % 16
    )
    failures = MockProver(cs, asg).verify()
    assert any("rng[2]" in f.name and "row 5" in f.detail for f in failures)


@pytest.mark.slow
def test_range_lookup_prove_verify_roundtrip():
    cs, t_rng, cols = _build()
    asg = _assign(cs, t_rng, cols, lambda ci, r: (5 * ci + 2 * r) % 16)
    srs = setup(K)
    pk = keygen(srs, cs, _assign(cs, t_rng, cols, lambda ci, r: 0))
    proof = create_proof(srs, pk, asg)
    assert verify_proof(srs, pk.vk, [], proof)
    # tamper: flip a byte — must reject
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    assert not verify_proof(srs, pk.vk, [], bytes(bad))


@pytest.mark.slow  # k=6 keygen+prove to hit a host ValueError; the same
# check runs mock-level in seconds (test_range_lookup_mock_catches_out_of_range)
def test_range_lookup_prover_rejects_out_of_range():
    cs, t_rng, cols = _build()
    asg = _assign(
        cs, t_rng, cols, lambda ci, r: 99 if (ci, r) == (0, 0) else r % 16
    )
    srs = setup(K)
    pk = keygen(srs, cs, _assign(cs, t_rng, cols, lambda ci, r: 0))
    with pytest.raises(ValueError, match="not in table"):
        create_proof(srs, pk, asg)


@pytest.mark.slow
def test_range_lookup_forged_multiplicity_rejected():
    """A proof whose committed m doesn't satisfy h_T·(β+t) = m fails.

    Simulated by proving honestly then flipping the m commitment bytes in
    the transcript (the first range-commit point after the advice block).
    """
    cs, t_rng, cols = _build(n_inputs=2)
    asg = _assign(cs, t_rng, cols, lambda ci, r: (ci + r) % 16)
    srs = setup(K)
    pk = keygen(srs, cs, _assign(cs, t_rng, cols, lambda ci, r: 0))
    proof = create_proof(srs, pk, asg)
    assert verify_proof(srs, pk.vk, [], proof)
    # advice commits come first (2 cols × 33 bytes each after vk absorb);
    # the m commit is the next point — corrupt it
    bad = bytearray(proof)
    bad[2 * 33 + 5] ^= 1
    assert not verify_proof(srs, pk.vk, [], bytes(bad))


@pytest.mark.slow
def test_range_lookup_mixed_with_plookup():
    """Range lookup coexists with a tuple plookup in one circuit."""
    cs = ConstraintSystem()
    t_rng = cs.fixed_column("t_rng")
    t_sq_x = cs.fixed_column("t_sq_x")
    t_sq_y = cs.fixed_column("t_sq_y")
    q = cs.fixed_column("q")
    x = cs.advice_column("x")
    y = cs.advice_column("y")
    cs.blinding_factors = 4
    cs.range_lookup("rng", [x.cur(), y.cur()], t_rng.cur())
    cs.lookup(
        "sq", [q.cur() * x.cur(), q.cur() * y.cur()],
        [t_sq_x.cur(), t_sq_y.cur()],
    )
    u = cs.usable_rows(N)
    srs = setup(K)

    def assign(xs, ys):
        asg = Assignment(cs, N)
        asg.set(t_rng, [i % 16 for i in range(N)])
        asg.set(t_sq_x, [i % 8 for i in range(N)])
        asg.set(t_sq_y, [(i % 8) ** 2 % 16 for i in range(N)])
        asg.set(q, [1] * u + [0] * (N - u))
        asg.set(x, xs + [0] * (N - len(xs)))
        asg.set(y, ys + [0] * (N - len(ys)))
        return asg

    xs = [i % 8 for i in range(u)]
    ys = [(i % 8) ** 2 % 16 for i in range(u)]
    MockProver(cs, assign(xs, ys)).assert_satisfied()
    pk = keygen(srs, cs, assign([0] * u, [0] * u))
    proof = create_proof(srs, pk, assign(xs, ys))
    assert verify_proof(srs, pk.vk, [], proof)
    # y in range but violating the tuple table pairing -> mock catches
    ys_bad = list(ys)
    ys_bad[3] = (ys_bad[3] + 1) % 16
    fails = MockProver(cs, assign(xs, ys_bad)).verify()
    assert any(f.name == "sq" for f in fails)
