"""Batch proof verification with a single accumulated IPA MSM.

True batching (the fork's `plonk::BatchVerifier` —
/root/reference/src/test_utils.rs:3,56-61, SURVEY.md §2 L6): each proof's
IPA check is the linear relation ⟨g_i, G⟩ + Σ (s·P) == 0 (see
ipa.verify_open_deferred).  N relations hold simultaneously (w.h.p.) iff
one random combination Σ ρ_i·rel_i == 0 holds, so N proofs cost all the
cheap host checks plus ONE size-n MSM — instead of N of them.

On failure, `finalize_detailed` falls back to per-proof verification
(mirroring gen_proofs_and_verify's SingleVerifier loop,
test_utils.rs:63-69).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass, field

from ..field.jfield import FP
from ..ipa import SRS
from ..ipa.ipa import check_deferred
from .keygen import VerifyingKey
from .verifier import _verify, verify_proof

P = FP.modulus


@dataclass
class BatchVerifier:
    items: list = field(default_factory=list)

    def add_proof(self, instances: list, proof: bytes) -> None:
        self.items.append((instances, proof))

    def finalize(self, srs: SRS, vk: VerifyingKey) -> bool:
        """True iff every queued proof verifies (one combined MSM)."""
        deferred: list = []
        for inst, proof in self.items:
            try:
                if not _verify(srs, vk, inst, proof, defer=deferred):
                    return False
            except (ValueError, AssertionError):
                return False
        if not deferred:
            return True
        import numpy as np

        n = srs.n
        combined_g = np.zeros(n, dtype=object)
        combined_terms: list = []
        for g_scalars, terms in deferred:
            rho = secrets.randbelow(P - 1) + 1
            combined_g = (combined_g + rho * np.asarray(g_scalars, dtype=object)) % P
            combined_terms.extend(
                (rho * sc % P, pt) for sc, pt in terms
            )
        return check_deferred(srs, combined_g, combined_terms)

    def finalize_detailed(self, srs: SRS, vk: VerifyingKey) -> list[bool]:
        """Per-proof verdicts (the SingleVerifier-fallback behaviour)."""
        return [
            verify_proof(srs, vk, inst, proof) for inst, proof in self.items
        ]
