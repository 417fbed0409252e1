"""Golden vectors: freeze the canonical encodings against format drift.

SURVEY §7 hard part 1: the reference's transcript framing lives in an
UNVENDORED fork (Orbis-Tertius/halo2 @ a9594525) that cannot be fetched
(zero egress) or built (no Rust toolchain in this image), so
cross-implementation byte vectors cannot be generated here.  The fallback
taken (documented in transcript.py) is our own canonical framing; these
tests freeze it — instance encoding, transcript challenge derivation, SRS
generator derivation — so any accidental format change across rounds is
caught, and a future environment with the fork can diff against one
stable target.

Emulator SEMANTICS (the part of the reference that is in-repo) are
separately pinned against hand-computed traces in test_emulator.py and
the reference's shrunken proptest corpus in test_regressions.py.
"""

import hashlib

import numpy as np

from tinyram_tpu.field import FP
from tinyram_tpu.tinyram import Imm, Instruction, Reg, TinyRamCircuit
from tinyram_tpu.tinyram.exe import instance_columns
from tinyram_tpu.transcript import TranscriptWriter


def I(op, ri=None, rj=None, a=0, areg=None):
    return Instruction(op, ri, rj, Reg(areg) if areg is not None else Imm(a))


PROG = [
    I("Mov", ri=2, a=55),
    I("And", ri=3, rj=2, a=0x0F),
    I("Answer", areg=3),
]


def test_instance_encoding_frozen():
    """SHA-256 over all instance columns of a fixed program
    (program_instance equivalent — prog.rs:38-60)."""
    circ = TinyRamCircuit(8, 8)
    cols = instance_columns(circ.tcs, PROG, 7, primary=[3], aux_len=1)
    h = hashlib.sha256()
    for name in sorted(cols):
        h.update(name.encode())
        h.update(np.asarray(cols[name], dtype=np.int64).tobytes())
    assert h.hexdigest() == (
        "b7442e5507331de2841149fabf985dcee728704d93be802b81ef11510e2dc48d"
    ), "instance encoding changed — bump this hash ONLY for deliberate format changes"


def test_transcript_challenges_frozen():
    """Challenge derivation for a fixed transcript byte sequence."""
    tw = TranscriptWriter()
    tw.common_scalar(12345)
    tw.write_scalar(67890)
    c1 = tw.challenge()
    tw.write_point((3, 5))
    c2 = tw.challenge()
    h = hashlib.sha256(f"{c1}:{c2}".encode()).hexdigest()
    assert h == (
        "cf27f91f398076d482a3ad662c6cd7a840dd0f6cd483e6b35e913c4a2e27c37b"
    ), "transcript challenge derivation changed"


def test_srs_generators_frozen():
    """First SRS generator points for k=3 (deterministic hash-to-curve)."""
    from tinyram_tpu.ipa.srs import setup

    srs = setup(3)
    from tinyram_tpu.curve import to_affine_host
    import jax.numpy as jnp

    from tinyram_tpu.curve import PointBatch

    pts = to_affine_host(
        PointBatch(srs.g.x[:, :2], srs.g.y[:, :2], srs.g.z[:, :2])
    )
    h = hashlib.sha256(repr(pts).encode()).hexdigest()
    assert h == (
        "1cc9fa9113d8b683c9b4e941a78398a7a7c2439010452771d552843feb340a84"
    ), "SRS generator derivation changed"
