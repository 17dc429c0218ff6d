#!/bin/bash
# Round-2 TPU experiment queue — run when the axon relay is back.
# ONE python process at a time (a killed TPU process wedges the chip claim
# ~10 min); everything under timeout; results land in /tmp/r2x_*.log.
#
#   bash scripts/tpu_r2_experiments.sh
#
# Sequence:
#   1. kernel correctness+timing (update_rows D128/D256, gather_rows,
#      grid-shaped gather vs XLA take)          -> /tmp/r2x_verify.log
#   2. bench.py default (update_rows + stacked MMoE wired in)
#   3. bench.py DMT_DMA_GRID_GATHER=1 (A/B the take_rows_sparse forward)
#   4. bench.py DMT_DMA_BWD=1        (A/B the sorted-segsum backward)
#   5. bench.py with both
#   6. trace decomposition of the winner       -> /tmp/r2x_trace.log
set -u
cd "$(dirname "$0")/.."

run() {
  local tag="$1"; shift
  echo "=== $tag: $* ==="
  timeout 2400 "$@" > "/tmp/r2x_${tag}.log" 2>&1
  local code=$?
  tail -6 "/tmp/r2x_${tag}.log"
  echo "=== $tag exit=$code ==="
  # cool-down so a timeout kill's claim wedge can expire before the next run
  if [ $code -ne 0 ]; then echo "(sleeping 660s after failure)"; sleep 660; fi
}

# bench_default FIRST: it warms the persistent compile cache for the
# driver's round-end bench (a cold flagship compile is ~35 min remote)
run bench_default python bench.py
run verify python scripts/verify_update_rows_tpu.py
run bench_gg env DMT_DMA_GRID_GATHER=1 python bench.py
run bench_bwd env DMT_DMA_BWD=1 python bench.py
run bench_mv env DMT_DMA_MV=1 python bench.py
run bench_both env DMT_DMA_GRID_GATHER=1 DMT_DMA_BWD=1 DMT_DMA_MV=1 python bench.py
# bf16 big tables: halves the Sku gather/grid HBM bytes (update math f32)
run bench_bf16 env DMT_TABLE_BF16_ROWS=1000000 python bench.py
run trace python scripts/trace_step.py
run serve python bench_serve.py
# int8-table serving bundle: 4x less table memory, D+4 bytes/row gathers
run export_int8 python -c "
import dataclasses
from cikm2020_dmt_tpu.core.config import DMTConfig
from cikm2020_dmt_tpu.serve.export import export_model
cfg = dataclasses.replace(DMTConfig.from_ini('conf/dmt_demo.conf'),
                          export_int8_rows=200000)
print(export_model(cfg, 185, export_dir='out/dmt_demo/int8_bundle'))"
run serve_int8 env DMT_SERVE_BUNDLE=out/dmt_demo/int8_bundle python bench_serve.py
