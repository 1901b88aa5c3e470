#!/bin/bash
# Round-5 queue #7 (replaces r5f; r5_bench_ab's outer timeout will cut its
# last stages, so the 1M gather-attack benches rerun here first):
#   1. 1M reduce-layout probe + featmajor / pay_gather=cm benches
#   2. PIPELINE_r05 rerun (resume past stage 1)
#   3. QUALITY_STRANDS_r05 short (reference OP rates, non-null)
#   4. pair_cull strand-scene end-to-end (part b) if time remains
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== 1M reduce-layout probe (featmajor vs rowmajor, + paygather cm) ==="
PROF_P=1000000 PROF_W=1920 PROF_H=1080 PROF_N=5 \
  PROF_ONLY="F_featmajor_trimm,F_rest_trimm,G_paygather" \
  timeout 2700 python tools/tpu_profile_r4.py 2>&1 \
  | grep -vE "^WARNING" | tail -6

echo "=== bench 1M featmajor (step_chunks=4) ==="
BENCH_IO=manual BENCH_STEP_CHUNKS=4 BENCH_REDUCE=featmajor BENCH_P=1000000 \
  BENCH_W=1920 BENCH_H=1080 BENCH_ITERS=8 \
  timeout 2700 python bench.py 2>&1 | grep -vE "^WARNING" | tail -1

echo "=== bench 1M pay_gather=cm (step_chunks=4) ==="
BENCH_IO=manual BENCH_STEP_CHUNKS=4 BENCH_PAY=cm BENCH_P=1000000 \
  BENCH_W=1920 BENCH_H=1080 BENCH_ITERS=8 \
  timeout 2700 python bench.py 2>&1 | grep -vE "^WARNING" | tail -1

echo "=== PIPELINE_r05 rerun (resume after stage 1) ==="
timeout 10800 python tools/pipeline_e2e_run.py \
  --out PIPELINE_r05_resume.json 2>&1 | grep -vE "^WARNING" | tail -20

echo "=== QUALITY_STRANDS_r05 (reference OP, warm start, SDS) ==="
QUALITY_LOG_EVERY=200 timeout 5400 python tools/quality_strands.py \
  --res 512 --views 16 --test_views 4 --teacher_strands 10000 \
  --num_strands 10000 --strand_length 100 --texture_size 256 \
  --iters2 2500 --iters3 1200 --capacity_mult 5 \
  --use_diffusion --use_sds_stage3 --warm_start 1500 \
  --out QUALITY_STRANDS_r05.json 2>&1 | grep -vE "^WARNING" | tail -20

echo "=== pair_cull strand scene (end-to-end, io=manual) ==="
MPC_IO=manual MPC_N=5 timeout 2400 \
  python tools/measure_pair_cull_strands.py 2>&1 \
  | grep -vE "^WARNING" | tail -8

echo "=== queue r5g done ==="
