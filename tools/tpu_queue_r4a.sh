#!/bin/bash
# Round-4 queue #1 (run exclusively on the chip, before the full quality run):
#   1. tpu_profile_r4.py — price the backward-reduce variants (sort vs
#      scatter-set vs scatter-add), the 3-operand fwd sort, and chunk
#      256/512/1024 end-to-end, to pick round-4 rasterizer defaults
#      (VERDICT r4 next #2).
#   2. reduce_mode=scatter HARDWARE parity gate (mandatory for any
#      binning/kernel data-movement change — the denormal lesson).
#   3. quick bench A/B: current defaults vs scatter (+chunk winner if any).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== profile r4 ==="
timeout 5400 python tools/tpu_profile_r4.py 2>&1 | grep -v "^WARNING"

echo "=== parity scatter (split3/bf16x2/packed) ==="
PAR_REDUCE=scatter PAR_POWER=split3 PAR_BWD_MATMUL=bf16x2 \
  timeout 2700 python tools/tpu_parity_check.py 2>&1 | grep -v "^WARNING" | tail -20

export BENCH_P=100000 BENCH_W=960 BENCH_H=544 BENCH_ITERS=20 BENCH_CAP_MULT=8
echo "=== bench current defaults ==="
timeout 2700 python bench.py 2>&1 | grep -v "^WARNING" | tail -3
echo "=== bench scatter ==="
BENCH_REDUCE=scatter timeout 2700 python bench.py 2>&1 | grep -v "^WARNING" | tail -3
echo "=== queue r4a done ==="
