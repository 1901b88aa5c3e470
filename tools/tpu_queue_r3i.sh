#!/bin/bash
# Round-3 session-7 queue #2:
#   1. power_mode=split3 hardware parity gate (the split2 replacement — same
#      25px-sigma scene that failed split2 at max 0.17)
#   2. split3 bench A/B (only meaningful if the gate PASSes)
#   3. reduce_mode=featmajor clean-box A/B (session-5 left rowmajor default
#      "pending a clean-box rerun")
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== parity split3 ==="
PAR_POWER=split3 PAR_BWD_MATMUL=bf16x2 timeout 1800 python tools/tpu_parity_check.py 2>&1 | grep -v "^WARNING" | tail -20

export BENCH_P=100000 BENCH_W=960 BENCH_H=544 BENCH_ITERS=20 BENCH_CAP_MULT=8
echo "=== bench split3 ==="
BENCH_POWER=split3 timeout 1800 python bench.py 2>&1 | grep -v "^WARNING" | tail -3
echo "=== bench featmajor ==="
BENCH_REDUCE=featmajor timeout 1800 python bench.py 2>&1 | grep -v "^WARNING" | tail -3
echo "=== queue done ==="
