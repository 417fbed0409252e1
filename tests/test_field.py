"""Field arithmetic tests: device limb kernels vs Python-int ground truth.

Mirrors the role of pasta_curves' own field tests, which the reference relies
on transitively (SURVEY.md §2, native-component ledger).
"""

import random

import numpy as np
import pytest

from tinyram_tpu.field import FP, FQ, fp_params, fq_params
from tinyram_tpu.field.params import GENERATOR, TWO_ADICITY


@pytest.fixture(params=["fp", "fq"])
def field(request):
    return FP if request.param == "fp" else FQ


def rand_ints(field, n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(field.modulus) for _ in range(n)]


def test_params_sanity():
    for par in (fp_params(), fq_params()):
        p = par.modulus
        assert p % 2 == 1 and p.bit_length() == 255
        assert (p - 1) % (1 << TWO_ADICITY) == 0
        # generator really generates: g^((p-1)/2) == -1
        assert pow(GENERATOR, (p - 1) // 2, p) == p - 1
        assert pow(par.root_of_unity, 1 << TWO_ADICITY, p) == 1
        assert pow(par.root_of_unity, 1 << (TWO_ADICITY - 1), p) == p - 1
        assert (par.n0_inv * p) % (1 << 16) == (1 << 16) - 1


def test_encode_decode_roundtrip(field):
    xs = rand_ints(field, 17, seed=1) + [0, 1, field.modulus - 1]
    enc = field.encode(xs)
    assert field.decode(enc) == xs


def test_add_sub_neg(field):
    n = 64
    xs = rand_ints(field, n, seed=2)
    ys = rand_ints(field, n, seed=3)
    a = field.encode(xs)
    b = field.encode(ys)
    p = field.modulus
    assert field.decode(field.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert field.decode(field.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert field.decode(field.neg(a)) == [(-x) % p for x in xs]


def test_mul(field):
    n = 64
    xs = rand_ints(field, n, seed=4) + [0, 1, field.modulus - 1, field.modulus - 1]
    ys = rand_ints(field, n, seed=5) + [5, field.modulus - 1, 1, field.modulus - 1]
    a = field.encode(xs)
    b = field.encode(ys)
    p = field.modulus
    assert field.decode(field.mul(a, b)) == [(x * y) % p for x, y in zip(xs, ys)]


def test_pow_and_inv(field):
    xs = rand_ints(field, 8, seed=6) + [1, field.modulus - 1]
    a = field.encode(xs)
    p = field.modulus
    e = 0xDEADBEEF12345
    assert field.decode(field.pow_const(a, e)) == [pow(x, e, p) for x in xs]
    got = field.decode(field.inv(a))
    assert got == [pow(x, p - 2, p) for x in xs]
    # inv(0) = 0 convention (needed by flag2 non-det witness, flag2.rs:61-74)
    assert field.decode(field.inv(field.encode([0])))[0] == 0


def test_predicates_and_select(field):
    a = field.encode([3, 0, 7])
    b = field.encode([3, 1, 9])
    assert list(np.asarray(field.eq(a, b))) == [True, False, False]
    assert list(np.asarray(field.is_zero(field.encode([0, 2])))) == [True, False]
    m = np.array([True, False, True])
    sel = field.select(m, a, b)
    assert field.decode(sel) == [3, 1, 7]


def test_vmap_and_jit_compose(field):
    import jax

    xs = rand_ints(field, 32, seed=7)
    ys = rand_ints(field, 32, seed=8)
    a = field.encode(xs).reshape(16, 4, 8)
    b = field.encode(ys).reshape(16, 4, 8)
    fn = jax.jit(field.mul)
    out = fn(a, b).reshape(16, 32)
    p = field.modulus
    assert field.decode(out) == [(x * y) % p for x, y in zip(xs, ys)]


def test_pallas_mul_interpret_matches(field):
    """Fused Pallas Montgomery kernel == jnp path (interpret mode on CPU)."""
    from tinyram_tpu.field.pallas_mul import mul_pallas

    xs = rand_ints(field, 256, seed=11)
    ys = rand_ints(field, 256, seed=12)
    a, b = field.encode(xs), field.encode(ys)
    got = field.decode(mul_pallas(a, b, field=field, block=256, interpret=True))
    assert got == [(x * y) % field.modulus for x, y in zip(xs, ys)]
