#!/bin/bash
# Round-4 CPU evidence ladder (VERDICT r3 #6 parity variance + #7 ladder
# bookkeeping).  All CPU-side; sequential so the 4 cores are never
# oversubscribed.  Logs land in /tmp/r4cpu_*.log.
set -u
cd "$(dirname "$0")/.."
CPU="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"

# 1. the r4 quality ladder: ALL 5 rungs at the conf step counts (185) in
#    one artifact (r3's committed rung-1 was a 3-step CI shape)
$CPU timeout 5400 python scripts/quality_ladder.py \
    --out results/quality_ladder_r4.json > /tmp/r4cpu_ladder.log 2>&1
echo "ladder exit=$?"

# 2. our side of the parity-variance table: 3 reseeded flagship runs
for seed in 7 19 23; do
  $CPU timeout 3600 python scripts/quality_ladder.py --rungs 5 \
      --seed "$seed" --out "out/parity_ours_seed${seed}.json" \
      > "/tmp/r4cpu_ours_${seed}.log" 2>&1
  echo "ours seed=$seed exit=$?"
done

# 3. reference side: 3 fresh TF1 runs (the reference sets no seed, so
#    each run draws fresh inits — exactly the run-to-run variance the
#    parity claim is made against)
for i in 1 2 3; do
  env -u PALLAS_AXON_POOL_IPS timeout 5400 python \
      scripts/reference_oracle.py > "/tmp/r4cpu_oracle_${i}.log" 2>&1
  echo "oracle run=$i exit=$?"
  cp out/reference_oracle/oracle_results.json "out/oracle_run${i}.json"
done
echo ALL DONE
