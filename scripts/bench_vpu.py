"""Microbenchmark: raw VPU u32 op throughput on the TPU chip.

Calibrates the speed-of-light for the 16x16-limb Montgomery multiply
(how many u32 multiplies/adds per second one chip sustains), so kernel
work can be compared against the hardware ceiling.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"],
               check=False, capture_output=True)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _sync(x):
    return np.asarray(jax.device_get(x.ravel()[:2]))


def make_kernel(op: str, reps: int):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = a
        for i in range(reps):
            if op == "mul":
                acc = acc * b
            elif op == "add":
                acc = acc + b
            elif op == "mulmask":  # the SOS inner pattern
                p = acc * b
                acc = (p & np.uint32(0xFFFF)) + (p >> np.uint32(16))
        o_ref[:] = acc

    return kernel


def bench(op, reps, shape=(16, 65536), block=512, dtype=jnp.uint32):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, shape).astype(np.uint32))
    b = jnp.asarray(rng.integers(1, 1 << 16, shape).astype(np.uint32))
    spec = pl.BlockSpec((shape[0], block), lambda i: (0, i))
    f = jax.jit(lambda a, b: pl.pallas_call(
        make_kernel(op, reps),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.uint32),
        grid=(shape[1] // block,),
        in_specs=[spec, spec],
        out_specs=spec,
    )(a, b))
    out = f(a, b); _sync(out)
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        out = f(a, b)
    _sync(out)
    dt = (time.time() - t0) / iters
    n_ops = shape[0] * shape[1] * reps
    print(f"{op:8s} reps={reps:4d}: {n_ops/dt/1e9:8.1f} G ops/s   ({dt*1e3:.2f} ms)")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    for op in ("add", "mul", "mulmask"):
        for reps in (64, 512):
            bench(op, reps)
