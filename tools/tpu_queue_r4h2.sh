#!/bin/bash
# Round-4 queue #8b — H skeleton-variant decomposition (the r4h run held
# the pre-edit script fd, so its stage 2 only ran H_fixed_probe).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "${1:-}" ]; then
  echo "=== waiting for pid $1 ==="
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "=== chip free, starting ==="
fi

echo "=== H skeleton variants @100k ==="
PROF_ONLY="H_" \
  timeout 7200 python tools/tpu_profile_r4.py 2>&1 | grep -v "^WARNING" | tail -6
echo "=== queue r4h2 done ==="
