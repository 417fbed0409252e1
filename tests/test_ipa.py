"""Transcript + IPA commitment tests (mirrors reference test_utils proof flow)."""

import random

import pytest

from tinyram_tpu.curve import host
from tinyram_tpu.field import FP
from tinyram_tpu.ipa import commit, open_poly, setup, verify_open
from tinyram_tpu.transcript import TranscriptReader, TranscriptWriter
from tinyram_tpu.transcript.transcript import point_from_bytes, _point_bytes


def test_transcript_roundtrip_and_determinism():
    pts = [None, host.scalar_mul(7, _some_point())]
    tw = TranscriptWriter()
    for pt in pts:
        tw.write_point(pt)
    tw.write_scalar(12345)
    c1 = tw.challenge()
    c2 = tw.challenge()
    assert c1 != c2  # chaining

    tr = TranscriptReader(tw.finalize())
    assert tr.read_point() is None
    assert tr.read_point() == pts[1]
    assert tr.read_scalar() == 12345
    assert tr.challenge() == c1
    assert tr.challenge() == c2
    assert tr.finished()


def test_point_compression_roundtrip():
    p = _some_point()
    q = host.neg(p)
    for pt in (p, q, None):
        assert point_from_bytes(_point_bytes(pt)) == pt


def _some_point():
    from tinyram_tpu.ipa.srs import _hash_to_curve

    return _hash_to_curve(b"test", 0)


@pytest.mark.slow
@pytest.mark.parametrize("k", [3, 5])
def test_ipa_commit_open_verify(k):
    srs = setup(k)
    rng = random.Random(70 + k)
    n = 1 << k
    coeffs = [rng.randrange(FP.modulus) for _ in range(n)]
    x = rng.randrange(FP.modulus)
    v = sum(c * pow(x, i, FP.modulus) for i, c in enumerate(coeffs)) % FP.modulus

    cd = FP.encode(coeffs)
    cm = commit(srs, cd)

    tw = TranscriptWriter()
    tw.common_point(cm)
    tw.common_scalar(x)
    tw.common_scalar(v)
    open_poly(srs, tw, cd, x)
    proof = tw.finalize()

    tr = TranscriptReader(proof)
    tr.common_point(cm)
    tr.common_scalar(x)
    tr.common_scalar(v)
    assert verify_open(srs, tr, cm, x, v)
    assert tr.finished()

    # soundness: wrong value must fail (mirrors
    # gen_proofs_and_verify_should_fail, test_utils.rs:73-119)
    tr2 = TranscriptReader(proof)
    tr2.common_point(cm)
    tr2.common_scalar(x)
    tr2.common_scalar(v)
    assert not verify_open(srs, tr2, cm, x, (v + 1) % FP.modulus)


@pytest.mark.slow
def test_ipa_short_poly_padding():
    srs = setup(4)
    rng = random.Random(90)
    coeffs = [rng.randrange(FP.modulus) for _ in range(5)]  # degree 4 < 16
    x = rng.randrange(FP.modulus)
    v = sum(c * pow(x, i, FP.modulus) for i, c in enumerate(coeffs)) % FP.modulus
    cd = FP.encode(coeffs)
    cm = commit(srs, cd)
    tw = TranscriptWriter()
    tw.common_point(cm)
    open_poly(srs, tw, cd, x)
    tr = TranscriptReader(tw.finalize())
    tr.common_point(cm)
    assert verify_open(srs, tr, cm, x, v)
