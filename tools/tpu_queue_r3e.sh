#!/bin/bash
# Round-3 session-5 queue #2: real-train-step knob A/B, then the final
# two-config BENCH_r03 with the winners.
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
cd /root/repo

# wait for queue r3d to finish
for i in $(seq 1 200); do
  grep -q "QUEUE DONE" /tmp/r3d_status.txt 2>/dev/null && break
  sleep 20
done

# 1. train-step A/B at 100k: fwd_acc flip, then vpu on top
BENCH_SKIP_1M=1 BENCH_ITERS=20 BENCH_FWD_ACC=bf16x2 \
  timeout 3600 python bench.py > /tmp/bench_acc.log 2>&1
echo "bench_acc: $?" >> /tmp/r3e_status.txt
BENCH_SKIP_1M=1 BENCH_ITERS=20 BENCH_FWD_ACC=bf16x2 BENCH_POWER=vpu \
  timeout 3600 python bench.py > /tmp/bench_vpu.log 2>&1
echo "bench_vpu: $?" >> /tmp/r3e_status.txt

echo "QUEUE DONE $(date)" >> /tmp/r3e_status.txt
