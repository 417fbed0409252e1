"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference (tiny-ram-halo2) runs its test suite single-process on CPU; we
additionally validate multi-chip sharding by forcing 8 virtual XLA host
devices, mirroring how the driver dry-runs `__graft_entry__.dryrun_multichip`.

NOTE: this box's sitecustomize force-registers the experimental `axon` TPU
platform and sets jax_platforms="axon,cpu" in every Python process, which
overrides the JAX_PLATFORMS env var.  We must override it back *after*
importing jax (but before any backend is initialized) so tests never touch
the single shared TPU chip.
"""

import os
import subprocess

# XLA's LLVM JIT creates several mmaps per compiled program; the prover
# compiles hundreds of programs and the default vm.max_map_count=65530
# exhausts, surfacing as "LLVM compilation error: Cannot allocate memory"
# followed by a segfault.  Raise it (best effort — needs root).
try:
    subprocess.run(
        ["sysctl", "-w", "vm.max_map_count=4000000"],
        check=False, capture_output=True,
    )
except Exception:
    pass

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache, ON by default for the CPU suite (round 3:
# verified on this box — the XLA:CPU AOT loader only warns about the
# +prefer-no-scatter/+prefer-no-gather tuning pseudo-features and loads
# correctly; a warm run skips the ~200 s of Pippenger/prover compiles that
# dominated the fast tier).  TINYRAM_NO_CACHE=1 opts out.
if not os.environ.get("TINYRAM_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/tinyram_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; axon TPU platform leaked through: "
    f"{jax.default_backend()}"
)
