"""NTT / domain tests against naive Python-int DFT ground truth."""

import random

import numpy as np
import pytest

from tinyram_tpu.field import FP
from tinyram_tpu.poly import Domain, eval_poly, ntt, omega_for, powers_device, tree_sum


def naive_dft(coeffs, omega, p):
    n = len(coeffs)
    return [
        sum(c * pow(omega, i * j, p) for j, c in enumerate(coeffs)) % p
        for i in range(n)
    ]


@pytest.mark.parametrize("log_n", [0, 1, 3, 6])
def test_ntt_matches_naive(log_n):
    n = 1 << log_n
    rng = random.Random(10 + log_n)
    coeffs = [rng.randrange(FP.modulus) for _ in range(n)]
    a = FP.encode(coeffs)
    w = omega_for(FP, log_n)
    got = FP.decode(ntt(FP, a))
    assert got == naive_dft(coeffs, w, FP.modulus)


@pytest.mark.parametrize("log_n", [1, 4, 8])
def test_ntt_roundtrip(log_n):
    n = 1 << log_n
    rng = random.Random(20 + log_n)
    coeffs = [rng.randrange(FP.modulus) for _ in range(n)]
    a = FP.encode(coeffs)
    back = FP.decode(ntt(FP, ntt(FP, a), inverse=True))
    assert back == coeffs


def test_powers_device_and_eval_poly():
    rng = random.Random(30)
    x = rng.randrange(FP.modulus)
    xd = FP.encode([x])[:, 0]
    pw = FP.decode(powers_device(FP, xd, 16))
    assert pw == [pow(x, i, FP.modulus) for i in range(16)]

    coeffs = [rng.randrange(FP.modulus) for _ in range(12)]
    cd = FP.encode(coeffs)
    got = FP.decode(eval_poly(FP, cd, xd)[:, None])[0]
    want = sum(c * pow(x, i, FP.modulus) for i, c in enumerate(coeffs)) % FP.modulus
    assert got == want


def test_tree_sum():
    rng = random.Random(40)
    xs = [rng.randrange(FP.modulus) for _ in range(37)]
    got = FP.decode(tree_sum(FP, FP.encode(xs))[:, None])[0]
    assert got == sum(xs) % FP.modulus


def test_domain_coset_quotient():
    """(X^n - 1)·f(X) divided back by Z_H recovers f on the coset."""
    k, ek = 3, 5
    dom = Domain(FP, k, ek)
    rng = random.Random(50)
    n = dom.n
    p = FP.modulus
    f = [rng.randrange(p) for _ in range(n)]
    # t(X) = f(X)·(X^n − 1)  (degree < n_ext)
    t = [(-c) % p for c in f] + [0] * 0 + f  # f·X^n − f
    t_ext = dom.coeff_to_extended(FP.encode(t))
    q_ext = dom.divide_by_vanishing(t_ext)
    q_coeffs = FP.decode(dom.extended_to_coeff(q_ext))
    assert q_coeffs[:n] == f
    assert all(c == 0 for c in q_coeffs[n:])


def test_domain_lagrange_roundtrip_and_l0():
    k, ek = 3, 5
    dom = Domain(FP, k, ek)
    rng = random.Random(60)
    p = FP.modulus
    evals = [rng.randrange(p) for _ in range(dom.n)]
    coeffs = dom.lagrange_to_coeff(FP.encode(evals))
    back = FP.decode(dom.coeff_to_lagrange(coeffs))
    assert back == evals

    # l_0 on the extended coset: inverse-transform and check it interpolates
    # 1 at ω^0 and 0 elsewhere on H.
    l0 = dom.l0_evals_ext()
    l0_coeffs = dom.extended_to_coeff(l0)
    x = rng.randrange(p)
    li = dom.lagrange_evals_host(x, [0, 1])
    # evaluate l0 poly at x and compare with closed form
    xd = FP.encode([x])[:, 0]
    got = FP.decode(eval_poly(FP, l0_coeffs, xd)[:, None])[0]
    assert got == li[0]
