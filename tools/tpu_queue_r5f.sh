#!/bin/bash
# Round-5 queue #6 (replaces r5e's tail; r5e's A/B keeps running, this waits
# on it): time-bounded so the chip is free before the round ends.
#   1. PIPELINE_r05 rerun (resumes past the finished stage 1; the stage-2
#      crash is fixed and the orchestrator now has an end-to-end smoke test)
#   2. QUALITY_STRANDS_r05 at the reference operating point, short iters
#      (steady-state rates are what VERDICT #2 needs non-null)
#   3. pair_cull strand-scene end-to-end timing (part b; part a measured
#      13.2% live-pair savings on CPU) — likely cut by the round end
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== PIPELINE_r05 rerun (resume after stage 1) ==="
timeout 12000 python tools/pipeline_e2e_run.py \
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

echo "=== queue r5f done ==="
