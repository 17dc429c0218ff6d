#!/bin/bash
# Round-4 TPU phase 4: e2e real-data ladder (VERDICT r3 #3).
# The identical 8632.5 ex/s for default vs DMT_XFER_THREAD=1 suggests a
# fixed-clock pacing in the relay; the detail run decomposes the chain,
# the ladder A/Bs the two mitigations (one-buffer packing = fewest RPCs,
# sub-16MB chunking = dodge the erratic per-buffer range).
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

run e2e_detail        env DMT_E2E_DETAIL=1 python bench_e2e.py
run e2e_onebuf        env DMT_PACK_ONEBUF=1 python bench_e2e.py
run e2e_chunk8        env DMT_PACK_CHUNK_MB=8 python bench_e2e.py
run e2e_onebuf_thread env DMT_PACK_ONEBUF=1 DMT_XFER_THREAD=1 python bench_e2e.py
echo PHASE4 DONE
