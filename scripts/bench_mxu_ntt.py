"""Benchmark the MXU digit-matmul NTT vs the Pallas VPU NTT on the chip.

Usage: python scripts/bench_mxu_ntt.py [log_sizes ...]  (default 16 20)
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
from tinyram_tpu.poly.mxu_ntt import ntt_mxu  # noqa: E402
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
    logs = [int(a) for a in sys.argv[1:]] or [16, 20]
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    for lg in logs:
        n = 1 << lg
        limbs = rng.integers(0, 1 << 16, size=(16, n)).astype(np.uint32)
        limbs[15] &= 0x3FFF
        a = jax.device_put(limbs)

        t0 = time.time()
        got = ntt_mxu(FP, a)
        _sync(got)
        print(f"2^{lg}: mxu first call (compile) {time.time()-t0:.1f}s",
              flush=True)
        want = ntt_pallas(FP, a, use_kernel=True)
        ok = bool(np.array_equal(np.asarray(jax.device_get(got)),
                                 np.asarray(jax.device_get(want))))
        print(f"2^{lg}: match vs pallas = {ok}", flush=True)
        if not ok:
            sys.exit(1)
        dt_m = _time(lambda x: ntt_mxu(FP, x), a)
        dt_p = _time(lambda x: ntt_pallas(FP, x, use_kernel=True), a)
        print(
            f"2^{lg}: mxu {n/dt_m/1e6:.1f}M elems/s   "
            f"pallas {n/dt_p/1e6:.1f}M elems/s   speedup {dt_p/dt_m:.2f}x",
            flush=True,
        )
        back = ntt_mxu(FP, got, inverse=True)
        ok = bool(np.array_equal(np.asarray(jax.device_get(back)),
                                 np.asarray(jax.device_get(a))))
        print(f"2^{lg}: inverse roundtrip = {ok}", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
