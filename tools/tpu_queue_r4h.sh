#!/bin/bash
# Round-4 queue #8 — decompose the per-chunk FIXED cost and pick the next
# lever.  r4g showed the log-domain VPU-pass cuts were perf-neutral on
# hardware (18.68 it/s @100k, 2.38 @1M): the kernels are NOT elementwise-
# bound, so this queue prices the fixed skeleton directly.
#   1. HARDWARE parity gate (micro-opt bundle: d_op=m1/op, vld drop,
#      done->lt_eff fold)
#   2. clean E_rast chunk A/B + H_fixed probe + G binning + F featmajor
#      at 100k (IDLE BOX — r4g's E_rast numbers were polluted by
#      concurrent pytest)
#   3. bench 100k at chunk 256/384/512
#   4. the same decomposition at 1M@1080p
#   5. bench 1M
#   6. fresh stage-2 steady-rate probe at the reference operating point
#      (fills QUALITY_STRANDS_r04's null stage2_iters_per_sec)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== parity micro-opts (split3/bf16x2/packed/rowmajor/trimm) ==="
PAR_BWD_MATMUL=bf16x2 PAR_POWER=split3 PAR_FWD_ACC=bf16x2 \
  PAR_REDUCE_CUMSUM=trimm \
  timeout 3600 python tools/tpu_parity_check.py 2>&1 | grep -v "^WARNING" | tail -16

echo "=== decomposition @100k (idle box) ==="
PROF_ONLY="E_rast_grad chunk,E_rast_fwd rowmajor,H_,G_,F_featmajor,F_rest_trimm,A_reduce,A_sort" \
  timeout 7200 python tools/tpu_profile_r4.py 2>&1 | grep -v "^WARNING" | tail -18

echo "=== bench 100k chunk=256 ==="
timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -2
echo "=== bench 100k chunk=384 ==="
BENCH_CHUNK=384 timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -2
echo "=== bench 100k chunk=512 ==="
BENCH_CHUNK=512 timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -2

echo "=== decomposition @1M@1080p ==="
PROF_P=1000000 PROF_W=1920 PROF_H=1080 PROF_N=5 \
  PROF_ONLY="E_rast_grad chunk=256,E_rast_grad chunk=512,E_rast_fwd rowmajor,H_fixed,G_bin_full,G_expand4,G_paygather,A_reduce_full,A_sort_only,F_rest_trimm,F_featmajor" \
  timeout 10800 python tools/tpu_profile_r4.py 2>&1 | grep -v "^WARNING" | tail -16

echo "=== bench 1M@1080p ==="
BENCH_P=1000000 BENCH_W=1920 BENCH_H=1080 \
  timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -2

echo "=== stage-2 steady-rate probe (reference operating point) ==="
QUALITY_LOG_EVERY=50 timeout 7200 python tools/quality_strands.py \
  --res 512 --views 16 --test_views 4 --teacher_strands 10000 \
  --num_strands 10000 --strand_length 100 --texture_size 256 \
  --iters2 400 --iters3 0 --capacity_mult 5 --use_diffusion \
  --rate_probe --out QUALITY_STRANDS_r04.json 2>&1 \
  | grep -v "^WARNING" | tail -12
echo "=== queue r4h done ==="
