#!/bin/bash
# Round-4 queue #7 — log-domain transmittance carry + fused sub-chunk loop
# (pallas_core): the kernels drop one full-[PIX, CH] transcendental, a
# divide and a multiply per sub-chunk, and touch the acc/carry refs once
# per chunk instead of per sub-chunk.
#   1. HARDWARE parity gate at production knobs (mandatory after any kernel
#      change — the denormal lesson)
#   2. fwd/grad kernel timing A/B vs the r4e numbers (E_rast_*)
#   3. bench 100k + 1M@1080p
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== parity logT (split3/bf16x2/packed/rowmajor/trimm) ==="
PAR_BWD_MATMUL=bf16x2 PAR_POWER=split3 PAR_FWD_ACC=bf16x2 \
  PAR_REDUCE_CUMSUM=trimm \
  timeout 3600 python tools/tpu_parity_check.py 2>&1 | grep -v "^WARNING" | tail -22

echo "=== kernel timing (PROF_ONLY=E_rast, 100k) ==="
PROF_ONLY=E_rast timeout 5400 python tools/tpu_profile_r4.py 2>&1 \
  | grep -v "^WARNING" | tail -10

echo "=== bench 100k logT ==="
timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -2
echo "=== bench 1M@1080p logT ==="
BENCH_P=1000000 BENCH_W=1920 BENCH_H=1080 \
  timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -2
echo "=== queue r4g done ==="
