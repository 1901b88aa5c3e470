#!/bin/bash
# Round-4 queue #3 — the at-scale quality artifacts (VERDICT r4 next #1):
#   1. stage-1 self-reconstruction at the reference operating point
#      (30k iters, 512 px, 50k-teacher) -> QUALITY_r04.json
#   2. stage-2/3 strand stack at the reference operating point
#      (L=100, 10k strands, texture 256, 20k/10k iters, 512 px, diffusion
#      self-prior in stage 2, SDS in the committed stage-3 path)
#      -> QUALITY_STRANDS_r04.json
# Runs under setsid so it survives 529-killed builder sessions; resumable
# via --resume2/--resume3 from runs/r4/ckpt2 checkpoints (every 2000 iters).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site
export QUALITY_LOG_EVERY=100
mkdir -p runs/r4/ckpt2

echo "=== stage-1 quality @512/30k ==="
timeout 14400 python tools/quality_run.py --iters 30000 --res 512 \
  --teacher_p 50000 --views 20 --test_views 4 --capacity_mult 8 \
  --out QUALITY_r04.json 2>&1 | grep -v "^WARNING" | tail -30

echo "=== stage-2/3 strands quality L=100/10k ==="
timeout 28800 python tools/quality_strands.py --res 512 --views 16 \
  --test_views 4 --teacher_strands 10000 --num_strands 10000 \
  --strand_length 100 --texture_size 256 --iters2 20000 --iters3 10000 \
  --capacity_mult 5 --use_diffusion --use_sds_stage3 --prior_steps 600 \
  --lambda_sds3 0.01 --ckpt_dir runs/r4/ckpt2 --ckpt_every 2000 \
  --out QUALITY_STRANDS_r04.json 2>&1 | grep -v "^WARNING"

echo "=== queue r4c done ==="
