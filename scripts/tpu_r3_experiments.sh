#!/bin/bash
# Round-3 TPU measurement ladder (VERDICT r2 next-round #1/#6/#7).
# ONE python process at a time on the chip; everything under timeout;
# logs land in /tmp/r3x_*.log.  bench_default already ran (89,588.6
# ex/s, /tmp/r3_bench_default.log) and warmed the compile cache.
set -u
cd "$(dirname "$0")/.."

run() {
  local tag="$1"; shift
  echo "=== $tag: $* ==="
  timeout 2700 "$@" > "/tmp/r3x_${tag}.log" 2>&1
  local code=$?
  grep -v WARNING "/tmp/r3x_${tag}.log" | tail -8
  echo "=== $tag exit=$code ==="
  if [ $code -ne 0 ]; then echo "(sleeping 630s: claim-wedge cooldown)"; sleep 630; fi
}

cpurun() {
  local tag="$1"; shift
  echo "=== $tag (cpu): $* ==="
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 1200 "$@" \
    > "/tmp/r3x_${tag}.log" 2>&1
  echo "=== $tag exit=$? ==="
}

# --- device A/Bs (each env flag = fresh executable; cache is warm for
#     previously-measured variants) --------------------------------------
run bench_f32  env DMT_TABLE_BF16_ROWS=0 python bench.py
run bench_gg   env DMT_DMA_GRID_GATHER=1 python bench.py
run bench_bwd  env DMT_DMA_BWD=1 python bench.py
run bench_mv   env DMT_DMA_MV=1 python bench.py
run bench_rerun python bench.py
# --- decompositions ------------------------------------------------------
run trace      python scripts/trace_step.py
run transfer   python scripts/transfer_bench.py
run e2e        python bench_e2e.py
# --- serving: demo chain on CPU produces the bundle, then TPU scorer -----
cpurun demo_train  python -m cikm2020_dmt_tpu.cli.train --conf_file conf/dmt_demo.conf
cpurun demo_export python -m cikm2020_dmt_tpu.cli.export --conf_file conf/dmt_demo.conf --model_ckpt model.ckpt-185
run serve      python bench_serve.py
cpurun export_int8 python -c "
import dataclasses
from cikm2020_dmt_tpu.core.config import DMTConfig
from cikm2020_dmt_tpu.serve.export import export_model
cfg = dataclasses.replace(DMTConfig.from_ini('conf/dmt_demo.conf'),
                          export_int8_rows=200000)
print(export_model(cfg, 185, export_dir='out/dmt_demo/int8_bundle'))"
run serve_int8 env DMT_SERVE_BUNDLE=out/dmt_demo/int8_bundle python bench_serve.py
echo ALL DONE
