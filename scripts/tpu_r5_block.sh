#!/bin/bash
# Round-5 TPU phase 1 (VERDICT r4 #1): backward-specific block size for
# the fused transformer kernel.
#   verify  - chunked dropout masks are nb-invariant on real hardware
#   base    - new default executable (chunked masks; confirm no
#             regression vs the r4 98.7k headline)
#   bwd32/16      - backward kernel at nb 32 / 16 under fwd nb 64
#   f128b64/f128b32 - forward at nb 128 (legal now that the backward,
#             whose 140M VMEM peak set the old nb=128 ceiling, is sized
#             independently)
# Each cell is a fresh bench.py process; first compile of each new
# executable is ~30-40 min through the remote-compile relay, cached
# afterwards.  Logs to /tmp/r5a_<tag>.log.
set -u
cd "$(dirname "$0")/.."

run() {
  local tag="$1"; shift
  echo "=== $tag: $* ==="
  timeout 5400 "$@" > "/tmp/r5a_${tag}.log" 2>&1
  local code=$?
  grep -v WARNING "/tmp/r5a_${tag}.log" | tail -8
  echo "=== $tag exit=$code ==="
  if [ $code -ne 0 ]; then echo "(sleeping 630s: claim-wedge cooldown)"; sleep 630; fi
}

run verify python scripts/block_nb_verify_tpu.py
if ! grep -q "BLOCK_NB_VERIFY_OK" /tmp/r5a_verify.log; then
  echo "mask invariance FAILED on hardware; aborting sweep"
  exit 1
fi
run base    python bench.py
run bwd32   env DMT_BLOCK_NB_BWD=32 python bench.py
run bwd16   env DMT_BLOCK_NB_BWD=16 python bench.py
run f128b64 env DMT_BLOCK_NB=128 DMT_BLOCK_NB_BWD=64 python bench.py
run f128b32 env DMT_BLOCK_NB=128 DMT_BLOCK_NB_BWD=32 python bench.py
echo R5_BLOCK_SWEEP_DONE
