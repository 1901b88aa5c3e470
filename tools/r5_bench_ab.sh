#!/bin/bash
# step_chunks (grouped grid steps, manual IO) hardware validation + A/B:
#   1. HARDWARE parity gate at group 4 (CPU bit-parity vs ungrouped is
#      already green: tests/test_rasterize.py::test_pallas_step_chunks_*)
#   2. kernel isolation fwd/bwd at 100k for group 1/2/4/8
#   3. bench A/B at 100k and 1M for the best-looking groups
# Invoked by tools/tpu_queue_r5d.sh once the chip frees up.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

echo "--- parity gate: manual + step_chunks=4 (split3/bf16x2/packed/trimm) ---"
PAR_IO=manual PAR_STEP_CHUNKS=4 PAR_BWD_MATMUL=bf16x2 PAR_POWER=split3 \
  PAR_REDUCE_CUMSUM=trimm PAR_CHUNK=256 \
  timeout 3600 python tools/tpu_parity_check.py 2>&1 \
  | grep -v "^WARNING" | tail -10

echo "--- kernel isolation @100k: group sweep (+ bit-identity check) ---"
timeout 3600 python tools/tpu_profile_groups.py 2>&1 \
  | grep -vE "^WARNING" | tail -16

echo "--- bench 100k step_chunks A/B ---"
for G in 4 8; do
  BENCH_IO=manual BENCH_STEP_CHUNKS=$G BENCH_SKIP_1M=1 \
    timeout 2500 python bench.py 2>&1 | grep -vE "^WARNING" | tail -1
done

echo "--- bench 1M step_chunks A/B ---"
for G in 4 8; do
  BENCH_IO=manual BENCH_STEP_CHUNKS=$G BENCH_P=1000000 BENCH_W=1920 \
    BENCH_H=1080 BENCH_ITERS=8 \
    timeout 3600 python bench.py 2>&1 | grep -vE "^WARNING" | tail -1
done

# the 1M reduce gather moves [S, 16] rows lane-padded to 128; featmajor's
# [16, S] layout moves logical bytes only (a wash at 100k: 9.39 vs 9.05 ms,
# r5d decomposition — never measured at 1M where the gather is 8x bigger)
echo "--- 1M reduce-layout probe + bench featmajor ---"
PROF_P=1000000 PROF_W=1920 PROF_H=1080 PROF_N=5 \
  PROF_ONLY="F_featmajor_trimm,F_rest_trimm,G_paygather" \
  timeout 3600 python tools/tpu_profile_r4.py 2>&1 \
  | grep -vE "^WARNING" | tail -6
BENCH_IO=manual BENCH_STEP_CHUNKS=4 BENCH_REDUCE=featmajor BENCH_P=1000000 \
  BENCH_W=1920 BENCH_H=1080 BENCH_ITERS=8 \
  timeout 3600 python bench.py 2>&1 | grep -vE "^WARNING" | tail -1
echo "--- 1M bench pay_gather=cm (channel-major payload gather) ---"
BENCH_IO=manual BENCH_STEP_CHUNKS=4 BENCH_PAY=cm BENCH_P=1000000 \
  BENCH_W=1920 BENCH_H=1080 BENCH_ITERS=8 \
  timeout 3600 python bench.py 2>&1 | grep -vE "^WARNING" | tail -1
echo "--- r5_bench_ab done ---"
