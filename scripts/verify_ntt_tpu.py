"""Verify + benchmark the Pallas NTT on the real TPU chip.

Usage: python scripts/verify_ntt_tpu.py [log_sizes ...]   (default 12 16 20)

Checks ntt_pallas (kernel path) against the jnp ntt for each size, then
times both.  Sync via device_get (axon: block_until_ready does not block).
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"],
               check=False, capture_output=True)

import jax  # noqa: E402

from tinyram_tpu.field import FP  # noqa: E402
from tinyram_tpu.poly import ntt  # noqa: E402
from tinyram_tpu.poly.pallas_ntt import ntt_pallas  # noqa: E402


def _sync(x):
    return np.asarray(jax.device_get(x.ravel()[:2]))


def _time(fn, *args, iters=3):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / iters


def main():
    logs = [int(a) for a in sys.argv[1:]] or [12, 16, 20]
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    for lg in logs:
        n = 1 << lg
        limbs = rng.integers(0, 1 << 16, size=(16, n)).astype(np.uint32)
        limbs[15] &= 0x3FFF
        a = jax.device_put(limbs)

        t0 = time.time()
        got = ntt_pallas(FP, a, use_kernel=True)
        _sync(got)
        print(f"2^{lg}: pallas first call (compile) {time.time()-t0:.1f}s")
        want = ntt(FP, a)
        ok = bool(np.array_equal(np.asarray(jax.device_get(got)),
                                 np.asarray(jax.device_get(want))))
        print(f"2^{lg}: match={ok}")
        if not ok:
            sys.exit(1)

        dt_p = _time(lambda x: ntt_pallas(FP, x, use_kernel=True), a)
        dt_j = _time(lambda x: ntt(FP, x), a)
        print(
            f"2^{lg}: pallas {n/dt_p/1e6:.1f}M elems/s   "
            f"jnp {n/dt_j/1e6:.1f}M elems/s   speedup {dt_j/dt_p:.1f}x"
        )

        # inverse roundtrip
        back = ntt_pallas(FP, got, inverse=True, use_kernel=True)
        ok = bool(np.array_equal(np.asarray(jax.device_get(back)),
                                 np.asarray(jax.device_get(a))))
        print(f"2^{lg}: inverse roundtrip={ok}")
        if not ok:
            sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
