#!/usr/bin/env bash
# Evaluator role (reference valid.sh equivalent): polls for checkpoints.
set -euo pipefail
CONF=${1:?conf file}
exec python -m cikm2020_dmt_tpu.cli.valid --conf_file "$CONF"
