#!/bin/bash
# Poll for the axon relay (claim port :8082); when it listens, give it a
# 90s settle window, then run the queued round-2 TPU experiments.
# Launched in the background; logs to /tmp/relay_watch.log.
set -u
cd "$(dirname "$0")/.."
echo "[relay_watch] start $(date -u +%FT%TZ)"
while true; do
  if ss -tln 2>/dev/null | grep -q ':8082 '; then
    echo "[relay_watch] relay up at $(date -u +%FT%TZ); settling 90s"
    sleep 90
    # double-check it stayed up
    if ss -tln 2>/dev/null | grep -q ':8082 '; then
      echo "[relay_watch] launching tpu_r2_experiments.sh"
      bash scripts/tpu_r2_experiments.sh
      echo "[relay_watch] experiments done at $(date -u +%FT%TZ)"
      exit 0
    fi
    echo "[relay_watch] relay flapped; resuming poll"
  fi
  sleep 60
done
