#!/bin/bash
# Round-4 TPU phase 6: benches for the row-stacked-moment DMA write-back
# (DMT_DMA_MV2, default on) + the flipped DMT_DMA_BWD default.
#   bench_newdef   = what the driver will run (code defaults)
#   bench_mv2_off  = isolation A/B (same graph minus the mv DMA)
#   bench_newdef_nb64 = candidate +0.5% on top
# Each is a fresh graph -> ~35 min remote compile, cached afterwards.
set -u
cd "$(dirname "$0")/.."

run() {
  local tag="$1"; shift
  echo "=== $tag: $* ==="
  timeout 4200 "$@" > "/tmp/r4x_${tag}.log" 2>&1
  local code=$?
  grep -v WARNING "/tmp/r4x_${tag}.log" | tail -6
  echo "=== $tag exit=$code ==="
  if [ $code -ne 0 ]; then echo "(sleeping 630s: claim-wedge cooldown)"; sleep 630; fi
}

run bench_newdef      python bench.py
run bench_mv2_off     env DMT_DMA_MV2=0 python bench.py
run bench_newdef_nb64 env DMT_BLOCK_NB=64 python bench.py
echo PHASE6 DONE
