#!/bin/bash
# Round-4 on-chip measurement campaign: run every staged experiment
# serialized, each with its own log + bounded runtime, then the full bench.
# Usage: bash scripts/run_tpu_campaign.sh [outdir]   (default /tmp/campaign)
# Safe to re-run: compile caches make repeats cheap; each step is skipped
# if its log already ends in CAMPAIGN_STEP_OK.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/campaign}
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

# 0. backend must be up (fail fast; 300 s covers slow init)
if ! timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "backend down; aborting campaign"
  exit 1
fi

# 1. vocoder stage attribution: fused arms first (compiles cache), then plain
step voc_t106_fused  python scripts/exp_vocoder_stages2.py 106
step voc_t26_fused   python scripts/exp_vocoder_stages2.py 26
step voc_t106_plain  python scripts/exp_vocoder_stages2.py 106 1 plain
step voc_t106_onehot env QWEN3TTS_RVQ_ONEHOT=1 python scripts/exp_vocoder_stages2.py 106
step voc_b32_plain   python scripts/exp_vocoder_stages2.py 48 32
step voc_b32_kernels env QWEN3TTS_VOCODER_KERNEL_BATCH=1 QWEN3TTS_RVQ_ONEHOT=1 \
                     python scripts/exp_vocoder_stages2.py 48 32 fusedbatch
# pre-transformer-only batch arm: its layer-outer grid reuses weights
# across batch rows; measure it WITHOUT the known-losing batched SEANet
step voc_b32_pt      env QWEN3TTS_VOCODER_KERNEL_BATCH=pt \
                     python scripts/exp_vocoder_stages2.py 48 32 ptbatch
# strip-tiled regime (T>128 was jnp-only before the cap lift): does the
# packed kernel still win at a 2x decode-chunk override?
step voc_t212_fused  python scripts/exp_vocoder_stages2.py 212
step voc_t212_plain  python scripts/exp_vocoder_stages2.py 212 1 plain

# 2. talker/cp overlap headroom (headline RTF lever)
step overlap         python scripts/exp_overlap_talker_cp.py

# 3. service-level TTFA at B=16 (burst + steady admission)
step service_ttfa    python scripts/exp_service_ttfa.py

# 4. full bench capture (always last: longest, and its numbers are the
#    round's record). The bench arms its own watchdog
#    (QWEN3TTS_BENCH_DEADLINE, default 2700 s) which force-emits the JSON
#    line on a wedge — the outer step timeout must be LARGER than that
#    deadline or we SIGTERM the bench before its watchdog can emit.
STEP_TIMEOUT=3300 step bench python bench.py

echo "campaign complete: $(ls "$OUT")"
