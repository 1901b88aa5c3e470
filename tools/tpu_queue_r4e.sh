#!/bin/bash
# Round-4 queue #5 — kernel-overhead leftovers, gated on the full-scale
# stage-3 rerun (pass its pid as $1):
#   1. profile r4 (A-F: reduce variants, chunk sweeps E, pair_cull E2,
#      reduce sub-breakdown F)
#   2. bench 1M@1080p pair_cull A/B (r4d got cut here)
#   3. batched per-camera-sort A/B (B=1/2/4)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== profile r4 (full: A-F) ==="
timeout 5400 python tools/tpu_profile_r4.py 2>&1 | grep -v "^WARNING" | tail -40

echo "=== bench 1M@1080p pair_cull=0 ==="
BENCH_P=1000000 BENCH_W=1920 BENCH_H=1080 \
  timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -2
echo "=== bench 1M@1080p pair_cull=1 ==="
BENCH_P=1000000 BENCH_W=1920 BENCH_H=1080 BENCH_PAIR_CULL=1 \
  timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -2

echo "=== batched sort fix A/B (B=1 2 4) ==="
BENCH_ITERS=10 timeout 3600 python tools/tpu_bench_batched.py 1 2 4 \
  2>&1 | grep -v "^WARNING" | tail -8
echo "=== queue r4e done ==="
