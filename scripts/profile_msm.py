"""Stage-by-stage MSM profiling on the real TPU chip.

Times each pipeline stage under its own jit so the dominant cost is
visible (axon tunnel: sync by fetching a tiny device slice).

Usage: python scripts/profile_msm.py [log_n]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"],
               check=False, capture_output=True)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import importlib  # noqa: E402

from tinyram_tpu.curve import PointBatch, vesta  # noqa: E402

# `import tinyram_tpu.curve.msm as M` would bind the re-exported *function*
M = importlib.import_module("tinyram_tpu.curve.msm")
from tinyram_tpu.field import FQ  # noqa: E402


def _sync(x):
    return np.asarray(jax.device_get(x.ravel()[:2]))


def timeit(name, fn, *args, iters=2):
    t0 = time.time()
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    _sync(leaves[0])
    compile_t = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / iters
    print(f"{name:30s} {dt*1e3:10.1f} ms   (first {compile_t:.1f}s)")
    return out


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << log_n
    print("device:", jax.devices()[0], " n = 2^%d" % log_n)
    rng = np.random.default_rng(5)

    # fake points: random field elements (fine for timing; adds are input-
    # independent complete formulas)
    coords = rng.integers(0, 1 << 16, size=(3, 16, n)).astype(np.uint32)
    coords[:, 15] &= 0x3FFF
    pts = PointBatch(*[jax.device_put(c) for c in coords])
    sc_limbs = rng.integers(0, 1 << 16, size=(16, n)).astype(np.uint32)
    sc_limbs[15] &= 0x3FFF
    sc = jax.device_put(sc_limbs)

    c = M.choose_window_bits(n)
    W = -(-M.SCALAR_BITS // c)
    G, lanes, L, n_pad = M._plan(n, W)
    print(f"c={c} W={W} G={G} lanes={lanes} L={L}")

    digits, signs = timeit(
        "signed digits", jax.jit(lambda s: M.signed_digits(s, c)), sc
    )
    dg, sg = digits[:G], signs[:G]

    sort = jax.jit(lambda d: jnp.argsort(d, axis=-1))
    order = timeit("argsort (G,N)", sort, dg)

    gather = jax.jit(lambda px, o: jnp.take(px, o, axis=-1))
    timeit("gather 1 coord minor-axis", gather, pts.x, order)

    def gather_rows(px, py, pz, o):
        G_, npad_ = o.shape
        tbl = jnp.concatenate([px, py, pz], axis=0).T  # (n, 48)
        g = jnp.take(tbl, o.reshape(-1), axis=0)
        return jnp.moveaxis(g.reshape(G_, npad_, 48), -1, 0)

    timeit("gather 3 coords row-major", jax.jit(gather_rows),
           pts.x, pts.y, pts.z, order)

    n_buckets = (1 << (c - 1)) + 1
    timeit(
        f"group_bucket_sums x{-(-W // G)}",
        jax.jit(lambda d, s, p: M._group_bucket_sums_inner(
            d, s, p, c, lanes, L, n_buckets
        )),
        dg, sg, pts,
    )

    buckets = M._bucket_sums_all(digits, signs, pts, c)
    wreduce = jax.jit(lambda b: M._weighted_bucket_reduce_signed(b, c))
    timeit("weighted_reduce", wreduce, buckets)
    wsums = wreduce(buckets)
    timeit("combine_windows",
           lambda w: M._combine_windows(w, c), wsums)

    out = timeit("full msm", lambda s: M.msm(s, pts), sc)
    # timeit's steady pass excludes the end-to-end program's first compile
    t0 = time.time()
    out = M.msm(sc, pts)
    _sync(out.x)
    dt = time.time() - t0
    print(f"{'full msm (steady)':30s} {dt*1e3:10.1f} ms  -> {n/dt:,.0f} pts/s")


if __name__ == "__main__":
    main()
