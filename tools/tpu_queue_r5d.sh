#!/bin/bash
# Round-5 queue #4 (replaces the tail of r5c after its PIPELINE run):
# perf data FIRST, long quality runs after — the r5c ordering would have
# spent the whole session on quality before the VERDICT-#1 perf work.
#   1. G/F/A decomposition at manual defaults, 100k (bottleneck data)
#   2. decomposition @1M (binning/sort share at the big scale)
#   3. hook: tools/r5_bench_ab.sh if present (kernel step-chunks A/B,
#      dropped in once the change lands with CPU parity green)
#   4. QUALITY_r05: 30k stage-1 self-reconstruction @512px, held-out curve
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== decomposition @100k (manual defaults) ==="
PROF_ONLY="G_,F_rest,F_featmajor,A_reduce,A_sort" timeout 4000 \
  python tools/tpu_profile_r4.py 2>&1 | grep -vE "^WARNING" | tail -30

echo "=== decomposition @1M ==="
PROF_P=1000000 PROF_W=1920 PROF_H=1080 PROF_N=5 \
  PROF_ONLY="G_bin_full,G_expand4,G_searchsorted,G_paygather,G_windows,A_reduce,A_sort,F_rest_trimm" \
  timeout 6000 python tools/tpu_profile_r4.py 2>&1 | grep -vE "^WARNING" | tail -16

if [ -x tools/r5_bench_ab.sh ]; then
  echo "=== kernel A/B hook ==="
  timeout 9000 tools/r5_bench_ab.sh 2>&1 | tail -60
fi

echo "=== QUALITY_r05 (30k @512px, held-out curve) ==="
QUALITY_LOG_EVERY=1000 timeout 7200 python tools/quality_run.py \
  --iters 30000 --res 512 --teacher_p 50000 --eval_every 3000 \
  --out QUALITY_r05.json 2>&1 | grep -vE "^WARNING|# it=" | tail -15

echo "=== queue r5d done ==="
