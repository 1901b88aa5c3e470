#!/bin/bash
# Round-5 queue #3 — the ledger + decision runs, safest-first:
#   1. PIPELINE_r05: full run.sh-shaped 30k/20k/10k @512px through
#      run_pipeline.py with per-stage wall-clock (VERDICT #2)
#   2. QUALITY_STRANDS_r05 at the reference operating point (10k strands,
#      L=100, 512px) with decoder warm start + SDS, rate fields non-null
#   3. QUALITY_r05: 30k stage-1 self-reconstruction @512px with the
#      held-out-view curve (VERDICT #4 evidence)
#   4. pair_cull strand-scene measurement (VERDICT #9)
#   5. fresh G/F/A decomposition at manual defaults, both scales (next
#      round's bottleneck data)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== PIPELINE_r05 (30k/20k/10k @512px end-to-end) ==="
timeout 25000 python tools/pipeline_e2e_run.py --out PIPELINE_r05.json \
  2>&1 | grep -vE "^WARNING" | tail -30

echo "=== QUALITY_STRANDS_r05 (reference OP, warm start, SDS) ==="
QUALITY_LOG_EVERY=200 timeout 14000 python tools/quality_strands.py \
  --res 512 --views 16 --test_views 4 --teacher_strands 10000 \
  --num_strands 10000 --strand_length 100 --texture_size 256 \
  --iters2 6000 --iters3 3000 --capacity_mult 5 \
  --use_diffusion --use_sds_stage3 --warm_start 3000 \
  --out QUALITY_STRANDS_r05.json 2>&1 | grep -vE "^WARNING" | tail -20

echo "=== QUALITY_r05 (30k @512px, held-out curve) ==="
QUALITY_LOG_EVERY=1000 timeout 7200 python tools/quality_run.py \
  --iters 30000 --res 512 --teacher_p 50000 --eval_every 3000 \
  --out QUALITY_r05.json 2>&1 | grep -vE "^WARNING|# it=" | tail -15

echo "=== pair_cull strand scene (io=manual) ==="
MPC_IO=manual timeout 7200 python tools/measure_pair_cull_strands.py \
  2>&1 | grep -vE "^WARNING" | tail -8

echo "=== decomposition @100k (manual defaults) ==="
PROF_ONLY="G_,F_rest,F_featmajor,A_reduce,A_sort" timeout 7200 \
  python tools/tpu_profile_r4.py 2>&1 | grep -vE "^WARNING" | tail -16

echo "=== decomposition @1M ==="
PROF_P=1000000 PROF_W=1920 PROF_H=1080 PROF_N=5 \
  PROF_ONLY="G_bin_full,G_expand4,G_paygather,A_reduce_full,A_sort_only,F_rest_trimm" \
  timeout 10800 python tools/tpu_profile_r4.py 2>&1 | grep -vE "^WARNING" | tail -10

echo "=== queue r5c done ==="
