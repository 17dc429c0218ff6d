#!/bin/bash
# Round-4 TPU measurement ladder — phase 1 (VERDICT r3 #1 serving + #8
# bench realism).  ONE python process at a time on the chip; everything
# under timeout; logs land in /tmp/r4x_*.log.
set -u
cd "$(dirname "$0")/.."

run() {
  local tag="$1"; shift
  echo "=== $tag: $* ==="
  timeout 2700 "$@" > "/tmp/r4x_${tag}.log" 2>&1
  local code=$?
  grep -v WARNING "/tmp/r4x_${tag}.log" | tail -8
  echo "=== $tag exit=$code ==="
  if [ $code -ne 0 ]; then echo "(sleeping 630s: claim-wedge cooldown)"; sleep 630; fi
}

# --- serving on-chip (bundles exist from r3 demo chain) -------------------
run serve      python bench_serve.py
run serve_int8 env DMT_SERVE_BUNDLE=out/dmt_demo/int8_bundle python bench_serve.py
# --- headline under cycling batches (default 8) + fixed-batch continuity --
run bench_cycle8 python bench.py
run bench_cycle1 env DMT_BENCH_CYCLE=1 python bench.py
echo ALL DONE
