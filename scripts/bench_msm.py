"""Standalone MSM benchmark on the real TPU chip (axon tunnel).

Points are generated on-device (random-bit scalar_mul of the SRS base
generators) to avoid minutes of host hash-to-curve at large N.

Usage: python scripts/bench_msm.py [log_n ...]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"],
               check=False, capture_output=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tinyram_tpu.curve import PointBatch, vesta  # noqa: E402
from tinyram_tpu.curve.msm import choose_window_bits, msm  # noqa: E402
from tinyram_tpu.field import FQ  # noqa: E402


def _sync(x):
    return np.asarray(jax.device_get(x.ravel()[:2]))


def gen_points_device(n: int, seed: int) -> PointBatch:
    """n pseudo-random points = k_i * G with k_i from a host RNG."""
    from tinyram_tpu.curve.host import scalar_mul as host_smul
    from tinyram_tpu.ipa.srs import _hash_to_curve

    base = _hash_to_curve(b"bench", 0)
    rng = np.random.default_rng(seed)
    bits = jnp.asarray(
        rng.integers(0, 2, size=(255, n)).astype(np.uint32)
    )
    from tinyram_tpu.curve.vesta import scalar_mul
    from tinyram_tpu.curve import from_affine_host

    g = from_affine_host([base])
    gb = PointBatch(
        jnp.broadcast_to(g.x, (16, n)),
        jnp.broadcast_to(g.y, (16, n)),
        jnp.broadcast_to(g.z, (16, n)),
    )
    return scalar_mul(bits, gb)


def main():
    logs = [int(a) for a in sys.argv[1:]] or [12, 16]
    print("device:", jax.devices()[0])
    for log_n in logs:
        n = 1 << log_n
        c = choose_window_bits(n)
        t0 = time.time()
        pts = gen_points_device(n, seed=log_n)
        _sync(pts.x)
        print(f"n=2^{log_n}: points generated in {time.time()-t0:.1f}s; c={c}")
        rng = np.random.default_rng(100 + log_n)
        sc_limbs = rng.integers(0, 1 << 16, size=(16, n)).astype(np.uint32)
        sc_limbs[15] &= 0x3FFF
        sc = jax.device_put(sc_limbs)
        t0 = time.time()
        out = msm(sc, pts)
        _sync(out.x)
        t_compile = time.time() - t0
        iters = 3 if log_n <= 16 else 1
        t0 = time.time()
        for _ in range(iters):
            out = msm(sc, pts)
        _sync(out.x)
        dt = (time.time() - t0) / iters
        print(
            f"n=2^{log_n}: {n/dt:,.0f} pts/s  ({dt*1e3:.1f} ms/msm, "
            f"first call incl compile {t_compile:.1f}s)"
        )


if __name__ == "__main__":
    main()
