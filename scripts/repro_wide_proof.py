"""Minimal CPU repro for the r4 W=16/k=10 chip verify failure.

A synthetic wide circuit (96 advice columns in one gate slab, so the
chunked coset lift is active) proved and verified on CPU with
TINYRAM_DEBUG=1.  Flags:
  --nochunk   set TINYRAM_EXT_CHUNK huge (disable chunked lift)
  --k N       circuit size (default 7)
  --cols N    advice column count (default 96)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = os.environ.get("REPRO_PLATFORM", "cpu")
os.environ.setdefault("TINYRAM_DEBUG", "1")
if "--nochunk" in sys.argv:
    os.environ["TINYRAM_EXT_CHUNK"] = "100000"


def main():
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np

    from tinyram_tpu.field import FP
    from tinyram_tpu.ipa import setup
    from tinyram_tpu.plonk import (
        Assignment, ConstraintSystem, create_proof, keygen, verify_proof,
    )

    K = next((int(sys.argv[i + 1]) for i, a in enumerate(sys.argv)
              if a == "--k"), 7)
    COLS = next((int(sys.argv[i + 1]) for i, a in enumerate(sys.argv)
                 if a == "--cols"), 96)
    N = 1 << K
    P = FP.modulus
    print(f"backend={jax.default_backend()} k={K} cols={COLS}", flush=True)

    cs = ConstraintSystem()
    q = cs.fixed_column("q")
    t_rng = cs.fixed_column("t_rng")
    cols = [cs.advice_column(f"a{i}") for i in range(COLS)]
    pub = cs.instance_column("pub")
    cs.blinding_factors = 4
    # chain gates touching every column (one wide slab) + a next-rotation
    for i in range(COLS - 1):
        cs.gate(f"mul{i}",
                q.cur() * (cols[i].cur() * cols[i].cur() - cols[i + 1].cur()))
    cs.gate("bind", q.cur() * (cols[0].cur() - pub.cur()))
    cs.gate("rot", q.cur() * (cols[1].next() - cols[1].next()))
    cs.lookup("rng", [q.cur() * cols[0].cur()], [t_rng.cur()])
    cs.range_lookup("rl", [cols[0].cur()], t_rng.cur())
    u = cs.usable_rows(N)
    srs = setup(K)

    rng = np.random.default_rng(0)

    def asg_for(values0):
        asg = Assignment(cs, N)
        asg.set(q, [1] * u + [0] * (N - u))
        asg.set(t_rng, list(range(16)) + [0] * (N - 16))
        vals = [values0]
        for i in range(1, COLS):
            vals.append([v * v % P for v in vals[-1]])
        for c, v in zip(cols, vals):
            asg.set(c, v + [0] * (N - len(v)))
        asg.set(pub, values0 + [0] * (N - len(values0)))
        return asg

    base = [int(rng.integers(0, 16)) for _ in range(u)]
    pk = keygen(srs, cs, asg_for(base))
    asg = asg_for(base)
    inst = [asg.instance[0]]
    proof = create_proof(srs, pk, asg)
    ok = verify_proof(srs, pk.vk, inst, proof)
    print("verify:", ok, flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
