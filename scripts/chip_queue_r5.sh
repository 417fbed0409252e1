#!/bin/bash
# Round-5 serial chip queue: runs after bench_prover completes.
cd /root/repo
set -x
# 1. MSM affine-path verification vs host oracle (public API, real chip)
timeout 1800 python scripts/verify_msm_tpu.py 8 > logs/verify_msm_r5.log 2>&1
# 2. config 3 real proof (k=17) with conservative memory knobs
TINYRAM_EXT_CHUNK=4 TINYRAM_GATE_SLAB=8 timeout 9000 \
  python scripts/prove_config3.py --prove 16 > logs/config3_prove_r5.log 2>&1
# 3. MSM throughput at 2^16 and 2^20 with the affine scan
timeout 2400 python scripts/bench_msm.py 16 20 > logs/bench_msm_r5.log 2>&1
# 4. modmul/point kernel rates -> the committed log VERDICT asked for
timeout 1500 python scripts/bench_kernels.py 18 > logs/bench_kernels_r5.log 2>&1
# 5. headline bench (warm caches)
timeout 1800 python bench.py > logs/bench_r5_main.log 2>&1
echo QUEUE_DONE
