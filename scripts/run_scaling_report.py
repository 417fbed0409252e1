"""Produce SCALING_VIRTUAL.json for bench.py to surface.

Runs the virtual-mesh scaling report (shard/scaling.py) on an 8-device
CPU mesh and persists it, so bench.py never recomputes it inline (the
inline subprocess is what timed out BENCH_r03 — VERDICT r3 item 1/9).

Usage: python scripts/run_scaling_report.py
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", "")
)
os.environ["JAX_PLATFORMS"] = "cpu"

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    if not os.environ.get("TINYRAM_NO_CACHE"):
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/tinyram_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    from tinyram_tpu.shard.scaling import scaling_report

    t0 = time.time()
    rep = scaling_report()
    rep["wall_s"] = round(time.time() - t0, 1)
    rep["backend"] = "cpu-virtual-8"
    with open(os.path.join(ROOT, "SCALING_VIRTUAL.json"), "w") as fh:
        json.dump(rep, fh, indent=1)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
