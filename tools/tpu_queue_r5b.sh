#!/bin/bash
# Round-5 queue #2 — after io_mode=manual landed (+9% at 100k), re-sweep the
# chunk size: the r4h "256 best" verdict was measured under AUTO io where
# every grid step paid the out-block machinery; with manual IO the per-step
# fixed cost is payload-DMA + grid bookkeeping only, so bigger chunks (fewer
# grid steps, coarser DMA) may now win.  Also isolate the backward kernel
# (K_bwd) per io mode — the r5a fwd/bwd split was ambiguous.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== K_bwd isolation, both io modes @100k ==="
PROF_BWD=1 PROF_ONLY="K_bwd" timeout 7200 python tools/tpu_profile_r5.py 2>&1 | grep -vE "^WARNING" | tail -6

echo "=== parity manual chunk=512 ==="
PAR_IO=manual PAR_CHUNK=512 PAR_REDUCE_CUMSUM=trimm timeout 3600 \
  python tools/tpu_parity_check.py 2>&1 | grep -vE "^WARNING" | tail -8

echo "=== bench 100k manual chunk=512 ==="
BENCH_IO=manual BENCH_CHUNK=512 timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -1
echo "=== bench 100k manual chunk=1024 ==="
BENCH_IO=manual BENCH_CHUNK=1024 timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -1
echo "=== bench 1M manual chunk=512 ==="
BENCH_P=1000000 BENCH_W=1920 BENCH_H=1080 BENCH_IO=manual BENCH_CHUNK=512 \
  timeout 3600 python bench.py 2>&1 | grep -v "^WARNING" | tail -1
echo "=== queue r5b done ==="
