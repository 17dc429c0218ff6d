#!/bin/bash
# Round-4 TPU phase 5: (1) hw probe of the kb-lane-block update_rows
# variant (f32 D=256 — the lazy-Adam moment write-back), (2) if it
# passes, bench DMT_DMA_MV2 alone and with nb=64 (candidate default),
# (3) the e2e mitigation ladder (scripts/tpu_r4_phase4.sh contents).
set -u
cd "$(dirname "$0")/.."

run() {
  local tag="$1"; shift
  echo "=== $tag: $* ==="
  timeout 3600 "$@" > "/tmp/r4x_${tag}.log" 2>&1
  local code=$?
  grep -v WARNING "/tmp/r4x_${tag}.log" | tail -12
  echo "=== $tag exit=$code ==="
  if [ $code -ne 0 ]; then echo "(sleeping 630s: claim-wedge cooldown)"; sleep 630; fi
}

run verify_mv python scripts/verify_update_rows_tpu.py
if grep -q "update f32 D=256: correct=True" /tmp/r4x_verify_mv.log; then
  run bench_mv2       env DMT_DMA_BWD=1 DMT_DMA_MV2=1 python bench.py
  run bench_mv2_nb64  env DMT_DMA_BWD=1 DMT_DMA_MV2=1 DMT_BLOCK_NB=64 python bench.py
else
  echo "D=256 multi-DMA probe failed; skipping MV2 benches"
fi

bash scripts/tpu_r4_phase4.sh
echo PHASE5 DONE
