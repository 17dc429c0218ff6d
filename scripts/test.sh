#!/usr/bin/env bash
# Test role (reference test.sh equivalent).
set -euo pipefail
CONF=${1:?conf file}
CKPT=${2:?model.ckpt-N}
TAG=${3:-ord}
METHOD=${4:-rel}
exec python -m cikm2020_dmt_tpu.cli.test --conf_file "$CONF" \
    --model_ckpt "$CKPT" --test_tag "$TAG" --test_score_method "$METHOD"
