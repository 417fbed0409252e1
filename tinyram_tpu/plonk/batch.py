"""Batch proof verification.

API-parity with the fork's `plonk::BatchVerifier`
(`add_proof`/`finalize(&params,&vk)` — /root/reference/src/test_utils.rs:3,
56-61, SURVEY.md §2 L6): queue several (instance, proof) pairs and verify
them together, falling back to reporting which individual proof failed —
mirroring gen_proofs_and_verify's SingleVerifier fallback loop
(test_utils.rs:63-69).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..ipa import SRS
from .keygen import VerifyingKey
from .verifier import verify_proof


@dataclass
class BatchVerifier:
    items: list = field(default_factory=list)

    def add_proof(self, instances: list, proof: bytes) -> None:
        self.items.append((instances, proof))

    def finalize(self, srs: SRS, vk: VerifyingKey) -> bool:
        """True iff every queued proof verifies."""
        return all(
            verify_proof(srs, vk, inst, proof) for inst, proof in self.items
        )

    def finalize_detailed(self, srs: SRS, vk: VerifyingKey) -> list[bool]:
        """Per-proof verdicts (the SingleVerifier-fallback behaviour)."""
        return [
            verify_proof(srs, vk, inst, proof) for inst, proof in self.items
        ]
