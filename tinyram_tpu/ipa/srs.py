"""SRS (unstructured generator set) for the IPA polynomial commitment.

Replaces `Params::<EqAffine>::new(k)` from the reference's proof driver
(/root/reference/src/test_utils.rs:21).  The fork's generator derivation is
unvendored, so tinyram-tpu defines its own: try-and-increment hash-to-curve
from Blake2b(label ‖ index ‖ counter), which yields nothing-up-my-sleeve
generators with unknown discrete logs.  Generation is host-side and cached
on disk per k (the reference rebuilds Params every run — SURVEY.md §5
"Checkpoint/resume: none"; we persist, as the survey recommends).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np

from ..curve import PointBatch, from_affine_host
from ..curve.host import AffinePoint, is_on_curve
from ..field.params import CURVE_B, Q_VESTA_BASE
from ..transcript.transcript import _sqrt_mod

_CACHE_DIR = os.environ.get(
    "TINYRAM_TPU_CACHE", os.path.expanduser("~/.cache/tinyram_tpu")
)


def _hash_to_curve(label: bytes, index: int) -> AffinePoint:
    q = Q_VESTA_BASE
    ctr = 0
    while True:
        raw = hashlib.blake2b(
            label + index.to_bytes(8, "little") + ctr.to_bytes(8, "little"),
            digest_size=32,
            person=b"tinyram-srs-v1",
        ).digest()
        x = int.from_bytes(raw, "little") % q
        rhs = (x * x * x + CURVE_B) % q
        y = _sqrt_mod(rhs, q)
        if y is not None:
            y = min(y, q - y)  # canonical (even-ish) choice
            pt = (x, y)
            assert is_on_curve(pt)
            return pt
        ctr += 1


@dataclass
class SRS:
    """k, the 2^k G generators, and the two auxiliary generators U, W."""

    k: int
    g_host: list[AffinePoint]
    u_host: AffinePoint
    w_host: AffinePoint
    g: PointBatch  # device copy of g_host

    @property
    def n(self) -> int:
        return 1 << self.k


def _gen_host(k: int) -> tuple[list[AffinePoint], AffinePoint, AffinePoint]:
    n = 1 << k
    path = os.path.join(_CACHE_DIR, f"srs_vesta_k{k}.npz")
    if os.path.exists(path):
        data = np.load(path)
        xs, ys = data["xs"], data["ys"]
        pts = [
            (int.from_bytes(xs[i].tobytes(), "little"),
             int.from_bytes(ys[i].tobytes(), "little"))
            for i in range(n + 2)
        ]
    else:
        pts = [_hash_to_curve(b"tinyram-tpu-srs-g", i) for i in range(n)]
        pts.append(_hash_to_curve(b"tinyram-tpu-srs-u", 0))
        pts.append(_hash_to_curve(b"tinyram-tpu-srs-w", 0))
        os.makedirs(_CACHE_DIR, exist_ok=True)
        xs = np.array(
            [np.frombuffer(p[0].to_bytes(32, "little"), np.uint8) for p in pts]
        )
        ys = np.array(
            [np.frombuffer(p[1].to_bytes(32, "little"), np.uint8) for p in pts]
        )
        np.savez(path, xs=xs, ys=ys)
    return pts[:n], pts[n], pts[n + 1]


_SRS_CACHE: dict[int, SRS] = {}


def setup(k: int) -> SRS:
    """Build (or load) the SRS for circuits of size 2^k."""
    if k in _SRS_CACHE:
        return _SRS_CACHE[k]
    g_host, u_host, w_host = _gen_host(k)
    srs = SRS(
        k=k,
        g_host=g_host,
        u_host=u_host,
        w_host=w_host,
        g=from_affine_host(g_host),
    )
    _SRS_CACHE[k] = srs
    return srs
