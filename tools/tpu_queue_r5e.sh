#!/bin/bash
# Round-5 queue #5 (after r5d's QUALITY_r05):
#   1. step_chunks hardware validation + bench A/B (tools/r5_bench_ab.sh —
#      the r5d hook missed it: the script wasn't executable yet when the
#      hook's -x test ran)
#   2. PIPELINE_r05 rerun: resumes past the finished stage 1 (the stage-2
#      scene-load crash is fixed — dataset._resize_map now accepts the
#      [1, H, W] orient_confs render_gaussians exports); stage-2/3/export
#      wall-clocks get merged with attempt 1's stage-1 time afterwards
#   3. QUALITY_STRANDS_r05 at the reference operating point (10k strands,
#      L=100, 512px), short iters, warm start + SDS, rate fields non-null
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== step_chunks A/B (tools/r5_bench_ab.sh) ==="
timeout 9000 bash tools/r5_bench_ab.sh 2>&1 | grep -vE "^WARNING" | tail -40

echo "=== PIPELINE_r05 rerun (resume after stage 1) ==="
timeout 18000 python tools/pipeline_e2e_run.py --out PIPELINE_r05_resume.json \
  2>&1 | grep -vE "^WARNING" | tail -20

echo "=== QUALITY_STRANDS_r05 (reference OP, warm start, SDS) ==="
QUALITY_LOG_EVERY=200 timeout 9000 python tools/quality_strands.py \
  --res 512 --views 16 --test_views 4 --teacher_strands 10000 \
  --num_strands 10000 --strand_length 100 --texture_size 256 \
  --iters2 4000 --iters3 2000 --capacity_mult 5 \
  --use_diffusion --use_sds_stage3 --warm_start 2000 \
  --out QUALITY_STRANDS_r05.json 2>&1 | grep -vE "^WARNING" | tail -20

echo "=== queue r5e done ==="
