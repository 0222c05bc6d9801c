#!/bin/bash
# Round-4 follow-up campaign: A/B the double-buffered units kernel against
# the morning's single-buffered T=106/T=26 numbers, attribute the SEANet
# block time per op, re-run the fixed service-TTFA experiment, and re-run
# the bench with readback barriers + the quantitative kernel-parity check.
# Usage: bash scripts/run_tpu_campaign2.sh [outdir]   (default /tmp/campaign2)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/campaign2}
mkdir -p "$OUT"

step() {
  local name=$1; shift
  local log="$OUT/$name.log"
  if [ -f "$log" ] && tail -1 "$log" | grep -q CAMPAIGN_STEP_OK; then
    echo "== $name: already done, skipping"
    return 0
  fi
  echo "== $name: $(date '+%H:%M:%S') -> $log"
  if timeout "${STEP_TIMEOUT:-2400}" "$@" > "$log" 2>&1; then
    echo CAMPAIGN_STEP_OK >> "$log"
  else
    echo "CAMPAIGN_STEP_FAILED rc=$?" >> "$log"
  fi
  tail -3 "$log"
}

if ! timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "backend down; aborting campaign"
  exit 1
fi

step voc_t106_dbuf   python scripts/exp_vocoder_stages2.py 106
step voc_t26_dbuf    python scripts/exp_vocoder_stages2.py 26
step voc_op_trace    python scripts/exp_vocoder_op_trace.py 106
step service_ttfa    python scripts/exp_service_ttfa.py
STEP_TIMEOUT=3300 step bench python bench.py

echo "campaign2 complete: $(ls "$OUT")"
