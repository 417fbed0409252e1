"""Micro-benchmark the fused Pallas kernels on the real chip.

Times the point-add kernels (the MSM scan's inner op) and the Montgomery
multiply kernel at prover-realistic widths, for block-size / layout A/B
comparisons.  Round 4: measures the (rows, 128) 2-D tile layout vs the
old 1-D lane rows (see curve/pallas_point.py module docstring).

Usage: python scripts/bench_kernels.py [lanes_log2=15]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"],
               check=False, capture_output=True)

import numpy as np


def _sync(x):
    import jax

    return np.asarray(jax.device_get(x.ravel()[:2]))


def _time(fn, *args, iters=5):
    out = fn(*args)
    _sync(out if not hasattr(out, "x") else out.x)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out if not hasattr(out, "x") else out.x)
    return (time.time() - t0) / iters


def main():
    lanes_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    n = 1 << lanes_log2

    import jax
    import jax.numpy as jnp

    from tinyram_tpu.curve import PointBatch, vesta
    from tinyram_tpu.curve import pallas_point as pp
    from tinyram_tpu.field import FQ
    from tinyram_tpu.field.pallas_mul import mul_pallas

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    # random field elements standing in for point coords (the add formula
    # is complete, so arbitrary residues exercise the same op count)
    def rand_f(shape):
        a = rng.integers(0, 1 << 16, size=(16,) + shape).astype(np.uint32)
        a[15] &= 0x3FFF
        return jax.device_put(a)

    p = PointBatch(rand_f((n,)), rand_f((n,)), rand_f((n,)))
    q = PointBatch(rand_f((n,)), rand_f((n,)), rand_f((n,)))
    mask = jax.device_put(
        rng.integers(0, 2, size=(n,)).astype(bool))

    for blk in (1024, 2048, 4096, 8192):
        dt = _time(lambda: pp.padd(p, q, block=blk))
        print(f"padd   block={blk:5d}: {n/dt/1e6:7.2f} M adds/s "
              f"({dt*1e3:.2f} ms @2^{lanes_log2})", flush=True)
    for blk in (1024, 2048, 4096):
        dt = _time(lambda: pp.padd_select(mask, p, q, block=blk))
        print(f"psel   block={blk:5d}: {n/dt/1e6:7.2f} M adds/s", flush=True)
    dt = _time(lambda: pp.pdouble(p, block=2048))
    print(f"pdbl   block= 2048: {n/dt/1e6:7.2f} M dbls/s", flush=True)

    nm = 1 << 18
    a, b = rand_f((nm,)), rand_f((nm,))
    for blk in (512, 1024, 2048, 4096):
        dt = _time(lambda: mul_pallas(a, b, block=blk))
        print(f"modmul block={blk:5d}: {nm/dt/1e6:7.2f} M muls/s", flush=True)


if __name__ == "__main__":
    main()
