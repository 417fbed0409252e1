"""Signed-digit Pippenger validation + bench on the chip.

Cross-checks the signed Pippenger (_msm_call) against the independent
bit-serial small-MSM path on identical inputs at 2^16 (two distinct
algorithms sharing only vesta.add), plus the host oracle at 2^8, then
times Pippenger at 2^16 and 2^20.
"""
import os, subprocess, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"], check=False, capture_output=True)
import numpy as np, jax
from tinyram_tpu.curve import PointBatch, from_affine_host, host, to_affine_host
from tinyram_tpu.curve.msm import _msm_call, _msm_small_call, choose_window_bits, msm
from tinyram_tpu.field import FP
from tinyram_tpu.ipa.srs import _hash_to_curve

def _sync(x):
    return np.asarray(jax.device_get(x.ravel()[:2]))

def main():
    print("device:", jax.devices()[0], flush=True)
    # 1) host-oracle check at 2^8 through the Pippenger path explicitly
    n0 = 256
    pts = [_hash_to_curve(b"signed", i) for i in range(n0)]
    pb = from_affine_host(pts)
    import random
    rng = random.Random(7)
    scalars = [0, 1, FP.modulus - 1] + [rng.randrange(FP.modulus) for _ in range(n0 - 3)]
    sc = FP.encode(scalars, to_mont=False)
    for c in (8, 13):
        t0 = time.time()
        got = to_affine_host(PointBatch(*[x[:, None] for x in _msm_call(sc, pb, c)]))[0]
        want = host.msm(scalars, pts)
        print(f"pippenger c={c} @2^8 vs host: {'OK' if got == want else 'MISMATCH'} ({time.time()-t0:.1f}s)", flush=True)
        assert got == want
    # 2) Pippenger vs bit-serial at 2^16 (independent device paths)
    n = 1 << 16
    rng2 = np.random.default_rng(3)
    coords = rng2.integers(0, 1 << 16, size=(3, 16, n)).astype(np.uint32)
    coords[:, 15] &= 0x3FFF
    fake = PointBatch(*[jax.device_put(x) for x in coords])  # not on curve; fine for algebra check? NO - use real points
    # real points: tile the 2^8 set (distinct scalars make the sum differ)
    reps = n // n0
    big = PointBatch(*[jax.numpy.tile(x, (1, reps)) for x in pb])
    sc_l = rng2.integers(0, 1 << 16, size=(16, n)).astype(np.uint32)
    sc_l[15] &= 0x3FFF
    scb = jax.device_put(sc_l)
    c = choose_window_bits(n)
    t0 = time.time()
    a = _msm_call(scb, big, c); _sync(a.x)
    t_first = time.time() - t0
    b = _msm_small_call(scb, big)
    pa = to_affine_host(PointBatch(*[x[:, None] for x in a]))[0]
    pb2 = to_affine_host(PointBatch(*[x[:, None] for x in b]))[0]
    print(f"pippenger(c={c}) vs bit-serial @2^16: {'OK' if pa == pb2 else 'MISMATCH'} (first {t_first:.1f}s)", flush=True)
    assert pa == pb2
    # 3) rates
    for it in range(3):
        t0 = time.time(); a = _msm_call(scb, big, c); _sync(a.x)
        dt = time.time() - t0
    print(f"msm @2^16: {n/dt:,.0f} pts/s ({dt*1e3:.0f} ms)", flush=True)
    n20 = 1 << 20
    reps = n20 // n0
    big20 = PointBatch(*[jax.numpy.tile(x, (1, reps)) for x in pb])
    sc20 = rng2.integers(0, 1 << 16, size=(16, n20)).astype(np.uint32)
    sc20[15] &= 0x3FFF
    s20 = jax.device_put(sc20)
    c20 = choose_window_bits(n20)
    t0 = time.time(); a = msm(s20, big20); _sync(a.x); print(f"msm @2^20 first (c={c20}): {time.time()-t0:.1f}s", flush=True)
    for it in range(2):
        t0 = time.time(); a = msm(s20, big20); _sync(a.x); dt = time.time() - t0
    print(f"msm @2^20: {n20/dt:,.0f} pts/s ({dt*1e3:.0f} ms)", flush=True)

if __name__ == "__main__":
    main()
