#!/bin/bash
# Round-4 TPU phase 7: remaining trace-driven A/Bs on top of the phase-6
# winner (run AFTER phase6; defaults then include DMA_BWD + DMA_MV2).
#   onehot_bf16 — bf16 cotangents for the small-table one-hot backward
#                 dots (~2.2 ms f32 in the r4 trace)
#   pack_slice  — lane-slice select_packed (dodge ~2.4 ms relayout pair)
#   both        — combined
#   trace_best  — device trace of the best combo for the docs
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

run bench_onehot_bf16 env DMT_ONEHOT_BF16=1 python bench.py
run bench_pack_slice  env DMT_PACK_SELECT=slice python bench.py
run bench_oh_slice    env DMT_ONEHOT_BF16=1 DMT_PACK_SELECT=slice python bench.py
echo PHASE7 DONE
