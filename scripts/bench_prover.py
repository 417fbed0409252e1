"""Full-prover benchmark on the real TPU chip (BASELINE config 2).

Usage: python scripts/bench_prover.py [steps_log2=12] [word_bits=24]

Proves a ~2^steps_log2-step arithmetic/bitwise TinyRAM trace at the given
word size (k = 2 + W/2), verifies it, and prints a JSON line with total
prover seconds plus the per-phase breakdown recorded by utils.profiling.
First run on a fresh process includes XLA/Mosaic compiles — the second
`prove` call is the steady-state number.

The proving key is persisted via plonk/serialize.py (round 4): the first
run pays keygen (~224 s at k=14) once, reruns load the pk in seconds.
Verify is timed twice — cold (incl. its own compiles) and warm.

Round 5: the top-level invocation is a RETRY DRIVER — it re-execs itself
with --inner in a subprocess, retrying transient tunnel/runtime failures
with backoff and stepping down the TINYRAM_EXT_CHUNK / TINYRAM_GATE_SLAB
memory knobs on HBM OOM (the knobs are read at tinyram_tpu import time,
so a fresh process per attempt is required for them to take effect).
"""

import json
import os
import subprocess
import sys
import time

# Failure-signature classification for the retry driver.  Transient axon
# tunnel errors (the r4c killer: "response body closed before all bytes
# were read") get a plain retry; HBM OOM gets a knob step-down + retry.
_OOM_MARKERS = ("RESOURCE_EXHAUSTED", "Out of memory", "OOM", "exceeds the"
                " memory available", "Ran out of memory",
                "Exceeded hbm capacity")
_TRANSIENT_MARKERS = ("response body closed", "remote_compile",
                      "UNAVAILABLE", "DEADLINE_EXCEEDED", "Socket closed",
                      "Connection reset", "INTERNAL:")


def _drive():
    max_attempts = int(os.environ.get("TINYRAM_BENCH_ATTEMPTS", "4"))
    ext_chunk = int(os.environ.get("TINYRAM_EXT_CHUNK", "64"))
    gate_slab = int(os.environ.get("TINYRAM_GATE_SLAB", "48"))
    for attempt in range(1, max_attempts + 1):
        env = dict(os.environ)
        env["TINYRAM_EXT_CHUNK"] = str(ext_chunk)
        env["TINYRAM_GATE_SLAB"] = str(gate_slab)
        print(f"[driver] attempt {attempt}/{max_attempts} "
              f"EXT_CHUNK={ext_chunk} GATE_SLAB={gate_slab}", flush=True)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--inner"]
            + sys.argv[1:],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        tail = []
        for line in proc.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            tail.append(line)
            if len(tail) > 400:
                tail.pop(0)
        rc = proc.wait()
        if rc == 0:
            return 0
        blob = "".join(tail)
        if any(m in blob for m in _OOM_MARKERS):
            ext_chunk = max(8, ext_chunk // 2)
            gate_slab = max(8, gate_slab // 2)
            print(f"[driver] OOM detected; stepping down to "
                  f"EXT_CHUNK={ext_chunk} GATE_SLAB={gate_slab}", flush=True)
        elif any(m in blob for m in _TRANSIENT_MARKERS):
            print("[driver] transient runtime/tunnel error; retrying",
                  flush=True)
        else:
            print(f"[driver] non-retryable failure (rc={rc}); giving up",
                  flush=True)
            return rc
        time.sleep(min(60, 10 * attempt))
    print("[driver] out of attempts", flush=True)
    return 1

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"],
               check=False, capture_output=True)

os.environ.setdefault("TINYRAM_PROFILE", "1")
os.environ.setdefault("TINYRAM_DEBUG", "1")  # name the failing check

_PK_CACHE_DIR = os.environ.get(
    "TINYRAM_TPU_CACHE", os.path.expanduser("~/.cache/tinyram_tpu")
)


def _git_stamp():
    """Commit + date stamp so cached artifacts are visibly (not) stale."""
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
    args = [a for a in sys.argv[1:] if a != "--inner"]
    steps_log2 = int(args[0]) if len(args) > 0 else 12
    word_bits = int(args[1]) if len(args) > 1 else 24

    import jax

    from tinyram_tpu.ipa import setup
    from tinyram_tpu.plonk.serialize import load_pk, save_pk
    from tinyram_tpu.tinyram import TinyRamCircuit, eval_program
    from tinyram_tpu.tinyram.bench_programs import config2_program
    from tinyram_tpu.utils.profiling import counters

    print("device:", jax.devices()[0], flush=True)
    prog = config2_program(1 << steps_log2, word_bits=word_bits)
    t0 = time.time()
    tr = eval_program(prog, word_bits, 8)
    print(f"emulated {len(tr)} steps in {time.time()-t0:.2f}s", flush=True)

    circ = TinyRamCircuit(word_bits, 8)
    print(f"k={circ.k} n={circ.tcs.n} advice={circ.tcs.cs.num_advice} "
          f"lookups={len(circ.tcs.cs.lookups)}", flush=True)
    t0 = time.time()
    srs = setup(circ.k)
    print(f"srs: {time.time()-t0:.1f}s", flush=True)

    pk_path = os.path.join(
        _PK_CACHE_DIR, f"pk_config2_w{word_bits}_r8_k{circ.k}.npz"
    )
    t0 = time.time()
    if os.path.exists(pk_path) and not os.environ.get("TINYRAM_NO_PK_CACHE"):
        pk = load_pk(pk_path, circ.tcs.cs)
        print(f"pk loaded from cache: {time.time()-t0:.1f}s", flush=True)
        keygen_s = 0.0
    else:
        pk = circ.keygen(srs)
        keygen_s = time.time() - t0
        print(f"keygen: {keygen_s:.1f}s", flush=True)
        os.makedirs(_PK_CACHE_DIR, exist_ok=True)
        save_pk(pk_path, pk)

    t0 = time.time()
    asg = circ.assignment(tr)
    witness_s = time.time() - t0
    print(f"witness build: {witness_s:.1f}s", flush=True)

    from tinyram_tpu.plonk import create_proof

    t0 = time.time()
    proof = create_proof(srs, pk, circ.assignment(tr))
    first_s = time.time() - t0
    print(f"prove (first, incl. compiles): {first_s:.1f}s", flush=True)

    counters.ops.clear(); counters.seconds.clear()
    t0 = time.time()
    proof = create_proof(srs, pk, circ.assignment(tr))
    steady_s = time.time() - t0
    print(f"prove (steady): {steady_s:.1f}s", flush=True)
    phases = {k.replace("prover.", ""): round(v, 2)
              for k, v in counters.seconds.items()}

    # persist the proof for post-mortem verification (a failed chip proof
    # can be re-verified on CPU with TINYRAM_DEBUG=1 to name the check)
    proof_path = os.path.join(
        _PK_CACHE_DIR, f"proof_last_w{word_bits}_k{circ.k}.bin"
    )
    os.makedirs(_PK_CACHE_DIR, exist_ok=True)
    with open(proof_path, "wb") as fh:
        fh.write(proof)
    t0 = time.time()
    ok = circ.verify(srs, pk, prog, tr.answer, proof)
    verify_cold_s = time.time() - t0
    assert ok, f"proof did not verify (saved at {proof_path})"
    t0 = time.time()
    ok = circ.verify(srs, pk, prog, tr.answer, proof)
    verify_s = time.time() - t0
    assert ok
    print(f"verify: {verify_cold_s:.1f}s cold, {verify_s:.1f}s warm",
          flush=True)

    result = {
        "metric": "proof_seconds_config2",
        "value": round(steady_s, 2),
        "unit": "s",
        "extra": {
            "steps": len(tr), "word_bits": word_bits, "k": circ.k,
            "first_prove_s": round(first_s, 1),
            "keygen_s": round(keygen_s, 1),
            "witness_s": round(witness_s, 1),
            "verify_cold_s": round(verify_cold_s, 1),
            "verify_warm_s": round(verify_s, 1),
            "proof_bytes": len(proof),
            "phases": phases,
            "device": str(jax.devices()[0]),
            "recorded": _git_stamp(),
        },
    }
    print(json.dumps(result), flush=True)
    # persist for bench.py to surface in the round's BENCH record — but
    # only the canonical config-2 shape (smoke runs at other sizes must
    # not clobber the headline artifact)
    if (steps_log2, word_bits) == (12, 24):
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "BENCH_PROVER.json"), "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(_drive())
