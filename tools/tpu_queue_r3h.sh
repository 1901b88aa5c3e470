#!/bin/bash
# Round-3 session-7 A/B queue: the NOTES_ROUND3 open items.
#   1. baseline (committed defaults) — same-session anchor
#   2. chunk 512
#   3. power_mode=split2
#   (chunk512 + split2 combined is a MANUAL follow-up, only if either
#   single knob wins — not run by this script)
# All at the 100k@960x544 bench config, capacity_mult pinned to 8
# (the right-sized value from BENCH_r02/r03) so each config compiles once.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
export BENCH_P=100000 BENCH_W=960 BENCH_H=544 BENCH_ITERS=20 BENCH_CAP_MULT=8

run() {
  local name="$1"; shift
  echo "=== $name ($*) ==="
  env "$@" timeout 1800 python bench.py 2>&1 | grep -v "^WARNING" | tail -4
}

run baseline
run chunk512 BENCH_CHUNK=512
run split2 BENCH_POWER=split2
echo "=== queue done ==="
