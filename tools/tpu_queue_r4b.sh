#!/bin/bash
# Round-4 queue #2: qualify chunk=512 as the new RasterConfig default.
#   1. HARDWARE parity gate at chunk=512 (split3/bf16x2/packed/rowmajor —
#      the candidate default set; mandatory after any chunk-layout change)
#   2. bench A/B chunk 256 vs 512 at the 100k bar
#   3. bench 1M@1080p with chunk=512 (the second bar)
# Then the chip is handed to the full-scale strands quality run.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== parity chunk=512 ==="
PAR_CHUNK=512 PAR_POWER=split3 PAR_BWD_MATMUL=bf16x2 \
  timeout 2700 python tools/tpu_parity_check.py 2>&1 | grep -v "^WARNING" | tail -8

export BENCH_P=100000 BENCH_W=960 BENCH_H=544 BENCH_ITERS=20 BENCH_CAP_MULT=8
echo "=== bench chunk=512 (100k) ==="
BENCH_CHUNK=512 timeout 2700 python bench.py 2>&1 | grep -v "^WARNING" | tail -2
echo "=== bench chunk=1024 (100k) ==="
BENCH_CHUNK=1024 timeout 2700 python bench.py 2>&1 | grep -v "^WARNING" | tail -2
echo "=== bench chunk=512 (1M@1080p) ==="
BENCH_P=1000000 BENCH_W=1920 BENCH_H=1080 BENCH_CAP_MULT=3 BENCH_CHUNK=512 \
  timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -2
echo "=== queue r4b done ==="
