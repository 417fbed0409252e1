"""BASELINE config 4: a 2^20-step full-ISA TinyRAM trace (W=24, k=21).

Round-5 deliverable (VERDICT r4 item 8): witness + mock at 2^20 steps.
The trace comes from the native C++ emulator (tinyram/native/), the
witness is the ordinary batched numpy build, and the mock runs on CPU
with the r5 vectorized lookup/LogUp membership checks.

Stages are gated so partial runs still record evidence into
BENCH_CONFIG4.json (merged incrementally, stamped with commit/round):
  1. emulate 2^20 steps (native) + build the k=21 witness;
  2. --mock: CPU mock-prove (no crypto) — config-4 capacity proof;
  3. --prove: real proof attempt on the current backend (chip).

Usage: python scripts/prove_config4.py [--mock] [--prove] [steps_log2=20]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"],
               check=False, capture_output=True)

MOCK = "--mock" in sys.argv
PROVE = "--prove" in sys.argv
if not PROVE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

W = 24
K = 21  # 2^20-step trace + memory log


def _git_stamp():
    try:
        sha = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True).stdout.strip()
    except Exception:
        sha = "unknown"
    return {"commit": sha or "unknown", "round": "r5",
            "date": time.strftime("%Y-%m-%d")}


def main():
    steps_log2 = next((int(a) for a in sys.argv[1:] if a.isdigit()), 20)
    import jax

    if not PROVE:
        jax.config.update("jax_platforms", "cpu")
    from tinyram_tpu.tinyram import TinyRamCircuit
    from tinyram_tpu.tinyram.bench_programs import config3_program
    from tinyram_tpu.tinyram.native import eval_program_native

    print("device:", jax.devices()[0], flush=True)
    prog = config3_program(1 << steps_log2, word_bits=W)
    t0 = time.time()
    tr = eval_program_native(prog, W, 8, max_steps=(1 << steps_log2) + 64)
    emu_s = time.time() - t0
    print(f"emulated {len(tr)} steps ({len(tr.accesses)} mem accesses) "
          f"in {emu_s:.2f}s (native)", flush=True)

    circ = TinyRamCircuit(W, 8, k=K)
    print(f"k={circ.k} n={circ.tcs.n} advice={circ.tcs.cs.num_advice} "
          f"lookups={len(circ.tcs.cs.lookups)} "
          f"range={len(circ.tcs.cs.range_lookups)}", flush=True)
    t0 = time.time()
    asg = circ.assignment(tr)
    witness_s = time.time() - t0
    print(f"witness build: {witness_s:.1f}s", flush=True)

    result = {"metric": "config4_2^20_steps", "value": len(tr),
              "unit": "steps",
              "extra": {"k": K, "word_bits": W,
                        "emulate_s": round(emu_s, 2),
                        "witness_s": round(witness_s, 1),
                        "recorded": _git_stamp()}}

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(root, "BENCH_CONFIG4.json")

    def _flush():
        merged = dict(result)
        if os.path.exists(out_path):
            try:
                with open(out_path) as fh:
                    prior = json.load(fh).get("extra", {})
                for k2, v in prior.items():
                    merged["extra"].setdefault(k2, v)
            except Exception:
                pass
        with open(out_path, "w") as fh:
            json.dump(merged, fh, indent=1)
        return merged

    _flush()

    if MOCK:
        from tinyram_tpu.plonk import MockProver

        t0 = time.time()
        failures = MockProver(circ.tcs.cs, asg).verify()
        dt = time.time() - t0
        print(f"mock verify: {dt:.1f}s failures={len(failures)}", flush=True)
        for f in failures[:10]:
            print("  ", f, flush=True)
        assert not failures, "config-4 witness does not satisfy the circuit"
        result["extra"]["mock_seconds"] = round(dt, 1)

    if PROVE:
        from tinyram_tpu.ipa import setup
        from tinyram_tpu.plonk import create_proof
        from tinyram_tpu.utils.profiling import counters

        os.environ.setdefault("TINYRAM_PROFILE", "1")
        t0 = time.time()
        srs = setup(circ.k)
        print(f"srs: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        pk = circ.keygen(srs)
        result["extra"]["keygen_s"] = round(time.time() - t0, 1)
        _flush()
        t0 = time.time()
        proof = create_proof(srs, pk, asg)
        first_s = time.time() - t0
        print(f"prove (first, incl. compiles): {first_s:.1f}s", flush=True)
        phases = {k2.replace("prover.", ""): round(v, 2)
                  for k2, v in counters.seconds.items()}
        t0 = time.time()
        ok = circ.verify(srs, pk, prog, tr.answer, proof)
        print(f"verify: {time.time()-t0:.1f}s ok={ok}", flush=True)
        assert ok
        result["extra"].update(proof_seconds=round(first_s, 1),
                               proof_bytes=len(proof), phases=phases)

    result = _flush()
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
