#!/bin/bash
# Round-3 session-5 TPU queue: kernel-knob decisions + reduce-gather probe.
# Runs AFTER the in-flight /tmp/par_vpu.log parity finishes (waits on it).
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
cd /root/repo

# wait for the already-running vpu parity to release the TPU (it ends with a
# PARITY OK/FAIL line; also proceed if it died without one)
for i in $(seq 1 120); do
  grep -q "PARITY" /tmp/par_vpu.log 2>/dev/null && break
  sleep 20
done

# 1. parity: fwd_acc=bf16x2 alone, then both knobs together
PAR_POWER=matmul PAR_FWD_ACC=bf16x2 PAR_BWD_MATMUL=bf16x2 \
  timeout 2400 python tools/tpu_parity_check.py > /tmp/par_acc.log 2>&1
echo "par_acc: $?" >> /tmp/r3d_status.txt
PAR_POWER=vpu PAR_FWD_ACC=bf16x2 PAR_BWD_MATMUL=bf16x2 \
  timeout 2400 python tools/tpu_parity_check.py > /tmp/par_both.log 2>&1
echo "par_both: $?" >> /tmp/r3d_status.txt

# 2. knob timing sweep at bench scale (fwd / fwd+grad, 4 combos)
timeout 5400 python tools/tpu_sweep_knobs.py > /tmp/sweep_knobs.log 2>&1
echo "sweep_knobs: $?" >> /tmp/r3d_status.txt

# 3. backward reduce variants at bench scale (r3b section B)
PROF_ONLY=B timeout 3600 python tools/tpu_profile_r3b.py > /tmp/prof_B.log 2>&1
echo "prof_B: $?" >> /tmp/r3d_status.txt

echo "QUEUE DONE $(date)" >> /tmp/r3d_status.txt
