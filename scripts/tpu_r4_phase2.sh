#!/bin/bash
# Round-4 TPU phase 2: write-back/backward A/B ladder + serving reruns.
# ONE python at a time; logs /tmp/r4x_*.log.  Fresh env-flag combos are
# fresh executables (~15-35 min remote compile each); the serving and
# cycle runs ride the warm cache.
set -u
cd "$(dirname "$0")/.."

run() {
  local tag="$1"; shift
  echo "=== $tag: $* ==="
  timeout 3600 "$@" > "/tmp/r4x_${tag}.log" 2>&1
  local code=$?
  grep -v WARNING "/tmp/r4x_${tag}.log" | tail -6
  echo "=== $tag exit=$code ==="
  if [ $code -ne 0 ]; then echo "(sleeping 630s: claim-wedge cooldown)"; sleep 630; fi
}

# --- headline candidates (fresh compiles) --------------------------------
# hybrid: f32 tables (DMA write-back) + bf16 grid + streaming backward
run bench_hybrid_bwd env DMT_TABLE_BF16_ROWS=0 DMT_GRID_BF16=1 DMT_DMA_BWD=1 python bench.py
# ablation: hybrid without the streaming backward
run bench_hybrid     env DMT_TABLE_BF16_ROWS=0 DMT_GRID_BF16=1 python bench.py
# ablation: bf16 tables (status quo) + streaming backward only
run bench_bf16_bwd   env DMT_DMA_BWD=1 python bench.py
# --- cycle A/B (warm cache: same executable as r3 default) ---------------
run bench_cycle8     python bench.py
# --- serving (device-resident bench_serve; scorer executables cached) ----
run serve            python bench_serve.py
run serve_int8       env DMT_SERVE_BUNDLE=out/dmt_demo/int8_bundle python bench_serve.py
# --- e2e (graph unchanged = warm cache) ----------------------------------
run e2e_default      python bench_e2e.py
run e2e_thread       env DMT_XFER_THREAD=1 python bench_e2e.py
echo ALL DONE
