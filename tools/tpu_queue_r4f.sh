#!/bin/bash
# Round-4 queue #6 — trimm-cumsum defaults decision, gated on the stage-3
# resume run (pass its pid as $1):
#   1. HARDWARE parity gate with reduce_cumsum=trimm at production knobs
#      (mandatory after any reduce change — the denormal lesson)
#   2. bench 100k trimm A/B
#   3. bench 1M@1080p trimm
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== parity trimm (split3/bf16x2/packed/rowmajor) ==="
PAR_BWD_MATMUL=bf16x2 PAR_POWER=split3 PAR_FWD_ACC=bf16x2 \
  PAR_REDUCE_CUMSUM=trimm \
  timeout 3600 python tools/tpu_parity_check.py 2>&1 | grep -v "^WARNING" | tail -22

echo "=== bench 100k trimm=linear ==="
timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -2
echo "=== bench 100k trimm ==="
BENCH_REDUCE_CUMSUM=trimm \
  timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -2
echo "=== bench 1M@1080p trimm ==="
BENCH_P=1000000 BENCH_W=1920 BENCH_H=1080 BENCH_REDUCE_CUMSUM=trimm \
  timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -2
echo "=== queue r4f done ==="
