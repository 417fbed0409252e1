"""tinyram-tpu: a TPU-native halo2-style ZK prover for TinyRAM traces.

Built from scratch in JAX/XLA/Pallas with the capabilities of the Rust
reference Orbis-Tertius/tiny-ram-halo2 (see SURVEY.md).
"""

__version__ = "0.1.0"
