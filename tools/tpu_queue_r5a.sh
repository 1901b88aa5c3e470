#!/bin/bash
# Round-5 queue #1 — io_mode=manual validation: hardware parity gate, kernel
# A/B at 100k and 1M, bench A/B at both scales.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== HARDWARE parity gate: io=manual (defaults: split3/bf16x2/packed/trimm) ==="
PAR_IO=manual PAR_BWD_MATMUL=bf16x2 PAR_POWER=split3 PAR_REDUCE_CUMSUM=trimm \
  timeout 3600 python tools/tpu_parity_check.py 2>&1 | grep -v "^WARNING" | tail -22

echo "=== io A/B @100k ==="
timeout 5400 python tools/tpu_profile_r5.py 2>&1 | grep -v "^WARNING" | tail -12

echo "=== io A/B @1M@1080p ==="
PROF_P=1000000 PROF_W=1920 PROF_H=1080 PROF_N=8 \
  timeout 5400 python tools/tpu_profile_r5.py 2>&1 | grep -v "^WARNING" | tail -12

echo "=== bench 100k io=manual ==="
BENCH_IO=manual timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -3

echo "=== bench 1M@1080p io=manual ==="
BENCH_IO=manual BENCH_P=1000000 BENCH_W=1920 BENCH_H=1080 \
  timeout 5400 python bench.py 2>&1 | grep -v "^WARNING" | tail -3
echo "=== queue r5a done ==="
