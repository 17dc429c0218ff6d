#!/usr/bin/env bash
# Chief role (reference train.sh equivalent).
set -euo pipefail
CONF=${1:?conf file}
CKPT=${2:-model.ckpt-0}
exec python -m cikm2020_dmt_tpu.cli.train --conf_file "$CONF" --model_ckpt "$CKPT"
