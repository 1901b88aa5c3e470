#!/bin/bash
# Round-3 session-3 TPU work queue: run the pending hardware artifacts the
# moment the axon tunnel is back.  Each step logs to /tmp/r3c_*.log; steps
# are ordered so a mid-queue tunnel drop loses the least.
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
cd /root/repo

# 1. kernel parity sanity (tunnel + kernels healthy; ~2 min warm)
timeout 2400 python tools/tpu_parity_check.py > /tmp/r3c_parity.log 2>&1
echo "parity: $?" >> /tmp/r3c_status.txt

# 2. feature-major precompute parity + timing (gates QH_PRECOMPUTE default)
timeout 2400 python tools/tpu_fm_parity.py > /tmp/r3c_fm.log 2>&1
echo "fm: $?" >> /tmp/r3c_status.txt

# 3. full strands artifact rerun with the antipodal-quaternion fix
#    (instrumented: grads_finite + max|d dirs| every 50 iters)
mkdir -p /tmp/strands_dump
QUALITY_LOG_EVERY=50 QUALITY_DUMP_DIR=/tmp/strands_dump \
  timeout 5400 python tools/quality_strands.py --ablate_sds \
  --out QUALITY_STRANDS_r03.json > /tmp/r3c_strands.log 2>&1
echo "strands: $?" >> /tmp/r3c_status.txt

# 3b. fm-precompute bench A/B (100k config only; occupancy-honest)
BENCH_SKIP_1M=1 BENCH_ITERS=20 timeout 3600 python bench.py \
  > /tmp/r3c_bench_row.log 2>&1
echo "bench_row: $?" >> /tmp/r3c_status.txt
QH_PRECOMPUTE=fm BENCH_SKIP_1M=1 BENCH_ITERS=20 timeout 3600 python bench.py \
  > /tmp/r3c_bench_fm.log 2>&1
echo "bench_fm: $?" >> /tmp/r3c_status.txt

# 4. pallas-under-mesh parity artifact (VERDICT r2 weak #7)
timeout 3600 python tools/tpu_mesh_parity.py --out PARITY_MESH_r03.json \
  > /tmp/r3c_mesh.log 2>&1
echo "mesh: $?" >> /tmp/r3c_status.txt

echo "QUEUE DONE $(date)" >> /tmp/r3c_status.txt
