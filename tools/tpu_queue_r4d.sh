#!/bin/bash
# Round-4 queue #4 — pair_cull qualification + leftovers (runs AFTER the
# full-scale strands quality run frees the chip; pass its pid as $1):
#   1. HARDWARE parity gate with pair_cull=1 (split3/bf16x2/packed/rowmajor
#      — the candidate default set; pallas+cull vs jnp-no-cull oracle gates
#      exactness AND kernel parity in one run; mandatory after any binning
#      change — see the denormal lesson in NOTES_ROUND3)
#   2. bench 100k A/B: pair_cull off vs on
#   3. bench 1M@1080p A/B (auto right-sized capacity)
#   4. tpu_bench_batched B=1/2/4 (per-camera segmented sort fix A/B)
#   5. tpu_profile_r4.py E section (chunk sweep of full rasterize+grad —
#      crashed last run on a duplicate-kwarg bug, since fixed)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 (quality run) ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== parity pair_cull (split3/bf16x2/packed) ==="
PAR_PAIR_CULL=1 PAR_POWER=split3 PAR_BWD_MATMUL=bf16x2 \
  timeout 2700 python tools/tpu_parity_check.py 2>&1 | grep -v "^WARNING" | tail -18

export BENCH_P=100000 BENCH_W=960 BENCH_H=544 BENCH_ITERS=20 BENCH_CAP_MULT=8
echo "=== bench 100k pair_cull=0 ==="
timeout 2700 python bench.py 2>&1 | grep -v "^WARNING" | tail -2
echo "=== bench 100k pair_cull=1 ==="
BENCH_PAIR_CULL=1 timeout 2700 python bench.py 2>&1 | grep -v "^WARNING" | tail -2

unset BENCH_CAP_MULT
echo "=== bench 1M@1080p pair_cull=0 ==="
BENCH_P=1000000 BENCH_W=1920 BENCH_H=1080 \
  timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -3
echo "=== bench 1M@1080p pair_cull=1 ==="
BENCH_P=1000000 BENCH_W=1920 BENCH_H=1080 BENCH_PAIR_CULL=1 \
  timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -3

echo "=== batched sort fix A/B (B=1 2 4) ==="
BENCH_ITERS=10 timeout 3600 python tools/tpu_bench_batched.py 1 2 4 \
  2>&1 | grep -v "^WARNING" | tail -8

echo "=== profile r4 (E section) ==="
timeout 5400 python tools/tpu_profile_r4.py 2>&1 | grep -v "^WARNING" | tail -30
echo "=== queue r4d done ==="
