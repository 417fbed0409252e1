"""Headline benchmark: MSM points/s + NTT elems/s + modmul/s on one chip.

Prints ONE JSON line:
  {"metric": "msm_points_per_s", "value": N, "unit": "points/s",
   "vs_baseline": 1.0, "extra": {...}}

The reference publishes no numbers (BASELINE.md: `published: {}`), so
vs_baseline is reported as 1.0 against our own first recorded round.

Axon quirk: `block_until_ready` does not actually block on this tunnel
(see memory: axon-tpu-pitfalls), so every timing fetches a device slice.
Sizes ramp gradually to avoid enqueueing unmeasured work.
"""

import json
import subprocess
import os
import sys
import time

import numpy as np


def _sync(x):
    import jax

    return np.asarray(jax.device_get(x if x.ndim == 0 else x.ravel()[:2]))


def _time(fn, *args, iters=3):
    out = fn(*args)
    _sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out if not isinstance(out, tuple) else out[0])
    return (time.time() - t0) / iters


def main():
    try:  # see tests/conftest.py: LLVM JIT mmap exhaustion otherwise
        subprocess.run(["sysctl", "-w", "vm.max_map_count=4000000"],
                       check=False, capture_output=True)
    except Exception:
        pass
    import jax

    from tinyram_tpu.field import FP
    from tinyram_tpu.poly import ntt

    extra = {"device": str(jax.devices()[0])}

    # --- batched modular multiply throughput
    n_mod = 1 << int(os.environ.get("BENCH_LOG_MODMUL", "18"))
    rng = np.random.default_rng(1)
    limbs = rng.integers(0, 1 << 16, size=(2, 16, n_mod)).astype(np.uint32)
    limbs[:, 15] &= 0x3FFF
    a, b = jax.device_put(limbs[0]), jax.device_put(limbs[1])
    dt = _time(FP.mul, a, b)
    extra["modmul_per_s"] = round(n_mod / dt)
    try:
        from tinyram_tpu.field.pallas_mul import mul_pallas

        dt = _time(mul_pallas, a, b)
        extra["modmul_pallas_per_s"] = round(n_mod / dt)
    except Exception as e:  # pallas unavailable on some backends
        extra["modmul_pallas_per_s"] = f"error: {type(e).__name__}"


    # --- NTT throughput (Pallas kernel path on TPU; see poly/pallas_ntt)
    n_ntt = 1 << int(os.environ.get("BENCH_LOG_NTT", "20"))
    rng2 = np.random.default_rng(2)
    nlimbs = rng2.integers(0, 1 << 16, size=(16, n_ntt)).astype(np.uint32)
    nlimbs[15] &= 0x3FFF
    c = jax.device_put(nlimbs)
    dt = _time(lambda x: ntt(FP, x), c)
    extra["ntt_elems_per_s"] = round(n_ntt / dt)
    extra["ntt_size"] = n_ntt
    extra["ntt_baseline_round"] = "r2 @2^20: 14.1M elems/s (same size)"

    # --- MSM throughput (2^16 for the like-for-like headline ratio vs
    # round 2's 451,408 pts/s @2^16, plus 2^20 — BASELINE config 4 scale)
    from tinyram_tpu.curve import PointBatch, from_affine_host
    from tinyram_tpu.curve.msm import msm
    from tinyram_tpu.ipa.srs import setup

    log_msm = int(os.environ.get("BENCH_LOG_MSM", "16"))
    srs = setup(log_msm)
    n_msm = 1 << log_msm
    sc_limbs = rng.integers(0, 1 << 16, size=(16, n_msm)).astype(np.uint32)
    sc_limbs[15] &= 0x3FFF
    sc = jax.device_put(sc_limbs)
    pts = srs.g
    dt = _time(lambda s: msm(s, pts).x, sc, iters=2)
    msm_rate = round(n_msm / dt)
    extra["msm_size"] = n_msm
    extra["msm_baseline_round"] = "r2 @2^16: 451408 pts/s (same size)"
    log_msm2 = int(os.environ.get("BENCH_LOG_MSM2", "20"))
    if log_msm2 > log_msm:
        try:
            srs2 = setup(log_msm2)
            n2 = 1 << log_msm2
            sc2_l = rng.integers(0, 1 << 16, size=(16, n2)).astype(np.uint32)
            sc2_l[15] &= 0x3FFF
            sc2 = jax.device_put(sc2_l)
            dt2 = _time(lambda s: msm(s, srs2.g).x, sc2, iters=2)
            extra[f"msm_points_per_s_2^{log_msm2}"] = round(n2 / dt2)
        except Exception as e:
            extra[f"msm_2^{log_msm2}"] = f"error: {type(e).__name__}"

    # --- virtual-mesh scaling report (BASELINE "1 chip / 1 host / N host"
    # axis: on this box the honest version is the 8-device virtual CPU mesh
    # + the single-chip numbers above).  Runs in a subprocess so the TPU
    # backend in this process is untouched.  BENCH_SCALING=0 skips.
    if os.environ.get("BENCH_SCALING", "1") != "0":
        code = (
            "import os,json;"
            "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8';"
            "os.environ['JAX_PLATFORMS']='cpu';"
            "import jax;jax.config.update('jax_platforms','cpu');"
            "jax.config.update('jax_compilation_cache_dir','/tmp/tinyram_tpu_jax_cache');"
            "jax.config.update('jax_persistent_cache_min_entry_size_bytes',-1);"
            "jax.config.update('jax_persistent_cache_min_compile_time_secs',0.3);"
            "from tinyram_tpu.shard.scaling import scaling_report;"
            "print('SCALING_JSON '+json.dumps(scaling_report()))"
        )
        try:
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                timeout=1200,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = next(
                (l for l in out.stdout.splitlines()
                 if l.startswith("SCALING_JSON ")), None,
            )
            extra["scaling_virtual_mesh"] = (
                json.loads(line[len("SCALING_JSON "):]) if line
                else f"no output (rc={out.returncode})"
            )
        except Exception as e:
            extra["scaling_virtual_mesh"] = f"error: {type(e).__name__}"

    # full-prover headline (BASELINE config 2), measured separately on the
    # chip by scripts/bench_prover.py (a ~1h first-compile job, too slow to
    # re-run inside this bench) and persisted to BENCH_PROVER.json
    prover_json = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_PROVER.json")
    if os.path.exists(prover_json):
        with open(prover_json) as fh:
            pr = json.load(fh)
        extra["proof_seconds_config2"] = pr["value"]
        extra["prover_detail"] = pr["extra"]
    c3_json = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_CONFIG3.json")
    if os.path.exists(c3_json):
        with open(c3_json) as fh:
            extra["config3_2^16_steps"] = json.load(fh)["extra"]

    # vs_baseline: SAME-SIZE ratio against round 2's recorded 451,408
    # pts/s @2^16 (the r2 artifact's 2.57 mixed 2^16 vs 2^12 — fixed per
    # ADVICE r2) — the reference publishes no numbers (BASELINE.md
    # `published: {}`), so our own prior round is the baseline.
    print(json.dumps({
        "metric": "msm_points_per_s",
        "value": msm_rate,
        "unit": "points/s",
        "vs_baseline": round(msm_rate / 451408, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
