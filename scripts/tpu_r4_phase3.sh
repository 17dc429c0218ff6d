#!/bin/bash
# Round-4 TPU phase 3: serving rerun (device-committed params + profiler
# device time), trusted hybrid+bwd rerun, device traces, nb=64 A/B.
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

# serving rerun: params committed to device once (the 2.8s/request was
# the ~150MB numpy bundle re-uploading per call) + profiler device time
run serve2      python bench_serve.py
run serve2_int8 env DMT_SERVE_BUNDLE=out/dmt_demo/int8_bundle python bench_serve.py
# rerun with the full-tree-blocking bench (the loss print is the tell)
run bench_hybrid_bwd2 env DMT_TABLE_BF16_ROWS=0 DMT_GRID_BF16=1 DMT_DMA_BWD=1 python bench.py
# ground truth: device traces of the two headline candidates
run trace_bf16_bwd   env DMT_DMA_BWD=1 DMT_TRACE_DETAIL=1 python scripts/trace_step.py
run trace_hybrid_bwd env DMT_TABLE_BF16_ROWS=0 DMT_GRID_BF16=1 DMT_DMA_BWD=1 DMT_TRACE_DETAIL=1 python scripts/trace_step.py
# block kernel nb=64 (fewer weight reloads; raised fwd VMEM guard)
run bench_nb64       env DMT_DMA_BWD=1 DMT_BLOCK_NB=64 python bench.py
echo PHASE3 DONE
