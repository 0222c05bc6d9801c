#!/bin/bash
# Probe the TPU backend every ~8 min; when it answers, run the full
# round-4 measurement campaign once and exit. Bounded at ~11 h total.
# Usage: bash scripts/watch_and_campaign.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/campaign}
DEADLINE=$(( $(date +%s) + 39600 ))
n=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  n=$((n + 1))
  if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "probe $n: backend UP at $(date '+%H:%M:%S'); starting campaign"
    bash scripts/run_tpu_campaign.sh "$OUT"
    echo "WATCHER_DONE rc=$?"
    exit 0
  fi
  echo "probe $n: backend down at $(date '+%H:%M:%S'); sleeping 480 s"
  sleep 480
done
echo "WATCHER_DEADLINE: backend never came up"
exit 1
