#!/usr/bin/env bash
# Full pipeline launcher (reference run.sh equivalent): chief training in
# the background, then evaluator / test / export against its checkpoints.
set -euo pipefail
CONF=${1:-conf/dmt_demo.conf}
CKPT=${2:-model.ckpt-0}
cd "$(dirname "$0")/.."

nohup bash scripts/train.sh "$CONF" "$CKPT" > train.log 2>&1 &
echo "chief started (train.log)"
# uncomment to run the evaluator alongside the chief:
# nohup bash scripts/valid.sh "$CONF" > valid.log 2>&1 &
# after training, score + export:
# bash scripts/test.sh "$CONF" model.ckpt-<STEP> ord rel
# python -m cikm2020_dmt_tpu.cli.export --conf_file "$CONF" --model_ckpt model.ckpt-<STEP>
