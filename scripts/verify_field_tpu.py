"""Field-kernel oracle check on the real chip.

Cross-checks every TPU dispatch path of FP.mul / mul_pallas (block sizes,
1-D vs 2-D tile layouts) and the Pallas NTT against exact host math.

Usage: python scripts/verify_field_tpu.py
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"],
               check=False, capture_output=True)

import numpy as np


def main():
    import jax

    from tinyram_tpu.field import FP
    from tinyram_tpu.field.pallas_mul import mul_pallas
    from tinyram_tpu.field.params import limbs_to_int
    from tinyram_tpu.poly import ntt

    print("device:", jax.devices()[0], flush=True)
    p = FP.modulus
    rng = np.random.default_rng(11)
    ok = True

    n = 4096
    raw = rng.integers(0, 1 << 16, size=(2, 16, n)).astype(np.uint32)
    raw[:, 15] &= 0x3FFF
    a, b = jax.device_put(raw[0]), jax.device_put(raw[1])
    ah = np.asarray(raw[0])
    bh = np.asarray(raw[1])
    # compare every kernel path against the jnp path (same Montgomery
    # semantics), then spot-check jnp against exact host ints
    want_dev = np.asarray(jax.device_get(FP.mul_jnp(a, b)))
    for blk in (512, 1024, 2048, 4096):
        got = np.asarray(jax.device_get(mul_pallas(a, b, block=blk)))
        s = "OK" if np.array_equal(got, want_dev) else "MISMATCH"
        ok &= np.array_equal(got, want_dev)
        print(f"mul_pallas block={blk}: {s}", flush=True)
    got_disp = np.asarray(jax.device_get(FP.mul(a, b)))
    s = "OK" if np.array_equal(got_disp, want_dev) else "MISMATCH"
    ok &= np.array_equal(got_disp, want_dev)
    print(f"FP.mul dispatch (lanes=4096): {s}", flush=True)

    # jnp-vs-host spot check (Montgomery: mul(aR, bR) = abR)
    r_inv = pow(1 << 256, p - 2, p)
    for i in range(4):
        ai = limbs_to_int(ah[:, i])
        bi = limbs_to_int(bh[:, i])
        wi = ai * bi * r_inv % p
        gi = limbs_to_int(want_dev[:, i])
        ok &= wi == gi
    print("jnp vs host ints:", "OK" if ok else "MISMATCH", flush=True)

    # NTT roundtrip + forward vs host naive at n=1024 (kernel path)
    n2 = 1024
    vals = [int(rng.integers(0, 1 << 60)) for _ in range(n2)]
    arr = FP.encode(vals)
    fwd = ntt(FP, arr)
    back = FP.decode(ntt(FP, fwd, inverse=True))
    s = "OK" if back == vals else "MISMATCH"
    ok &= back == vals
    print(f"ntt roundtrip n={n2} (pallas kernel): {s}", flush=True)
    from tinyram_tpu.poly.ntt import omega_for

    w = omega_for(FP, 10)
    fwd_host_3 = [
        sum(v * pow(w, (k * j) % n2, p) for j, v in enumerate(vals)) % p
        for k in (0, 1, 5)
    ]
    fwd_dec = FP.decode(fwd)
    s = "OK" if [fwd_dec[0], fwd_dec[1], fwd_dec[5]] == fwd_host_3 else "MISMATCH"
    ok &= [fwd_dec[0], fwd_dec[1], fwd_dec[5]] == fwd_host_3
    print(f"ntt forward vs host (3 points): {s}", flush=True)

    # batched (multi-column) NTT: the prover's actual shape class —
    # column-stacked transforms share the kernel's lane axis
    cols = 8
    vals_b = [
        [int(rng.integers(0, 1 << 60)) for _ in range(n2)]
        for _ in range(cols)
    ]
    import jax.numpy as jnp

    arr_b = jnp.stack([FP.encode(v) for v in vals_b], axis=1)  # (16, B, n)
    fwd_b = ntt(FP, arr_b)
    back_b = ntt(FP, fwd_b, inverse=True)
    ok_b = True
    single = [np.asarray(jax.device_get(ntt(FP, FP.encode(v))))
              for v in vals_b]
    fwd_host = np.asarray(jax.device_get(fwd_b))
    back_host = np.asarray(jax.device_get(back_b))
    for ci in range(cols):
        ok_b &= np.array_equal(fwd_host[:, ci], single[ci])
        ok_b &= FP.decode(jnp.asarray(back_host[:, ci])) == vals_b[ci]
    ok &= ok_b
    print(f"ntt batched ({cols} cols) vs single-col + roundtrip: "
          f"{'OK' if ok_b else 'MISMATCH'}", flush=True)

    print("ALL OK" if ok else "FAILURES PRESENT", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
