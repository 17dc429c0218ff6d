#!/bin/bash
# Round-5 TPU phase 2 (after tpu_r5_block.sh):
#   small_bf16 - bf16 storage for the SMALL tables too
#                (DMT_TABLE_BF16_ROWS=500; the r4 trace's 2.75 ms
#                sequence-cotangent add_any and several f32 gathers ride
#                f32 small-table grids — VERDICT r4 #5 probe, zero-code)
#   trace_base / trace_win - device-op decompositions for the shipped
#                defaults and the block-sweep winner (set via $1, e.g.
#                `bash tpu_r5_phase2.sh "DMT_BLOCK_NB_BWD=32"`)
#   serve      - serving concurrency curve (bench_serve.py; needs the
#                flagship export under out/dmt_demo)
set -u
cd "$(dirname "$0")/.."
WIN_ENV="${1:-}"

run() {
  local tag="$1"; shift
  echo "=== $tag: $* ==="
  timeout 5400 "$@" > "/tmp/r5b_${tag}.log" 2>&1
  local code=$?
  grep -v WARNING "/tmp/r5b_${tag}.log" | tail -8
  echo "=== $tag exit=$code ==="
  if [ $code -ne 0 ]; then echo "(sleeping 630s: claim-wedge cooldown)"; sleep 630; fi
}

run small_bf16 env DMT_TABLE_BF16_ROWS=500 python bench.py
run trace_base python scripts/trace_step.py --steps 10 --out /tmp/r5_trace_base
if [ -n "$WIN_ENV" ]; then
  run trace_win env $WIN_ENV python scripts/trace_step.py --steps 10 --out /tmp/r5_trace_win
fi
if ls out/dmt_demo/dmt_demo.model/frozen/ckpt-* >/dev/null 2>&1; then
  run serve python bench_serve.py
else
  echo "no flagship export; skipping serve cell"
fi
echo R5_PHASE2_DONE
