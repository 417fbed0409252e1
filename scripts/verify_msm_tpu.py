"""End-to-end MSM verification on the real TPU chip.

Drives the public API (tinyram_tpu.curve.msm / msm_many) with the fused
Pallas point kernels active (default on TPU) and cross-checks results
against the pure-Python host oracle, including adversarial digit skew.

Usage: python scripts/verify_msm_tpu.py [log_n]
"""

import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"],
               check=False, capture_output=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tinyram_tpu.curve import (  # noqa: E402
    PointBatch,
    from_affine_host,
    host,
    to_affine_host,
)
from tinyram_tpu.curve.msm import msm, msm_many  # noqa: E402
from tinyram_tpu.field import FP  # noqa: E402
from tinyram_tpu.ipa.srs import _hash_to_curve  # noqa: E402


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = 1 << log_n
    print("device:", jax.devices()[0], "backend:", jax.default_backend())
    pts = [_hash_to_curve(b"verify", i) for i in range(n)]
    pb = from_affine_host(pts)

    rng = random.Random(1)
    cases = {
        "random": [rng.randrange(FP.modulus) for _ in range(n)],
        "edge": [0, 1, FP.modulus - 1, 2]
        + [rng.randrange(FP.modulus) for _ in range(n - 4)],
        "skew(all-equal)": [123456789] * n,
        "tiny(selector-like)": [rng.randrange(2) for _ in range(n)],
    }
    ok = True
    for name, scalars in cases.items():
        sc = FP.encode(scalars, to_mont=False)
        got = to_affine_host(
            PointBatch(*[c[:, None] for c in msm(sc, pb)])
        )[0]
        want = host.msm(scalars, pts)
        status = "OK" if got == want else "MISMATCH"
        ok &= got == want
        print(f"msm[{name:>20s}] n=2^{log_n}: {status}")

    # msm_many: 3 columns through the batched path
    cols = [cases["random"], cases["edge"], cases["tiny(selector-like)"]]
    sc = jnp.stack([FP.encode(c, to_mont=False) for c in cols], axis=1)
    got = to_affine_host(msm_many(sc, pb))
    want = [host.msm(c, pts) for c in cols]
    status = "OK" if got == want else "MISMATCH"
    ok &= got == want
    print(f"msm_many[3 cols] n=2^{log_n}: {status}")
    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
