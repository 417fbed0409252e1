"""MSM window-size A/B sweep on the real chip (VERDICT r3 weak #3).

Times the Pippenger pipeline across window sizes c at the sizes the
prover uses (2^14/2^16 circuit commits, 2^20 = BASELINE config-4 scale)
so choose_window_bits can be tuned from measurements instead of the
analytic add-count model.

Usage: python scripts/tune_msm_window.py [log_n=16] [c1,c2,...]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"],
               check=False, capture_output=True)

import numpy as np


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cs = (
        [int(c) for c in sys.argv[2].split(",")]
        if len(sys.argv) > 2 else [12, 13, 14, 15, 16]
    )
    import jax

    from tinyram_tpu.curve.msm import _msm_call, choose_window_bits
    from tinyram_tpu.ipa.srs import setup

    print("device:", jax.devices()[0], flush=True)
    n = 1 << log_n
    srs = setup(log_n)
    rng = np.random.default_rng(5)
    sc = rng.integers(0, 1 << 16, size=(16, n)).astype(np.uint32)
    sc[15] &= 0x3FFF
    scd = jax.device_put(sc)
    print(f"n=2^{log_n}; analytic chooser says c={choose_window_bits(n)}",
          flush=True)

    for c in cs:
        out = _msm_call(scd, srs.g, c)
        np.asarray(jax.device_get(out.x.ravel()[:2]))  # compile+run
        t0 = time.time()
        for _ in range(2):
            out = _msm_call(scd, srs.g, c)
        np.asarray(jax.device_get(out.x.ravel()[:2]))
        dt = (time.time() - t0) / 2
        print(f"c={c:2d}: {n/dt/1e3:8.1f} K pts/s ({dt*1e3:.0f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
