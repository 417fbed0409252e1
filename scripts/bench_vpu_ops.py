"""Raw VPU op-throughput probe: u32 mul vs add vs f32 mul inside Pallas.

Determines the per-op cost model for the Montgomery kernels: if the u32
multiply is emulated (multi-op) on this VPU, limb schemes that trade
multiplies for float ops become attractive.

Usage: python scripts/bench_vpu_ops.py
"""

import os
import subprocess
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"],
               check=False, capture_output=True)

import jax
import jax.numpy as jnp
import numpy as np

REPS = 256  # chained ops per element inside the kernel
ROWS, LANE = 256, 128
GRID = 64


def _kernel_factory(op):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        x = a
        for _ in range(REPS):
            if op == "u32mul":
                x = x * b
            elif op == "u32add":
                x = x + b
            elif op == "u32shift":
                x = (x >> jnp.uint32(3)) ^ b
            elif op == "f32mul":
                x = x * b
            elif op == "f32fma":
                x = x * b + a
        o_ref[...] = x

    return kernel


@partial(jax.jit, static_argnames=("op", "dtype_name"))
def run(a, b, op, dtype_name):
    from jax.experimental import pallas as pl

    spec = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0))
    return pl.pallas_call(
        _kernel_factory(op),
        out_shape=jax.ShapeDtypeStruct((GRID * ROWS, LANE), a.dtype),
        grid=(GRID,),
        in_specs=[spec, spec],
        out_specs=spec,
    )(a, b)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    ui = rng.integers(1, 1 << 16, size=(GRID * ROWS, LANE)).astype(np.uint32)
    uf = rng.random(size=(GRID * ROWS, LANE)).astype(np.float32) + 1.0

    n_ops = GRID * ROWS * LANE * REPS
    for op, arr in [
        ("u32mul", ui), ("u32add", ui), ("u32shift", ui),
        ("f32mul", uf), ("f32fma", uf),
    ]:
        a = jax.device_put(arr)
        b = jax.device_put(arr)
        out = run(a, b, op, str(arr.dtype))
        np.asarray(jax.device_get(out[:1, :2]))
        t0 = time.time()
        for _ in range(10):
            out = run(a, b, op, str(arr.dtype))
        np.asarray(jax.device_get(out[:1, :2]))
        dt = (time.time() - t0) / 10
        print(f"{op:9s}: {n_ops/dt/1e9:8.1f} G ops/s  ({dt*1e3:.2f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
