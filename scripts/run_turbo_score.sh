#!/bin/bash
# VERDICT r4 item 1: score the turbo preset end-to-end through the closed
# loop, under a DURABLE root inside the repo (the /tmp root loss already
# cost r4l its number). Chain:
#   build -> stage0 -> train -> distill(+4-step) -> distill-stage0 ->
#   eval video,video_s0distilled,video_turbo -> CLOSED_LOOP_TURBO.json
# Same spec/step budgets as r4h/r4j for comparability.
set -e -o pipefail
ROOT=${1:-/root/repo/experiments/closed_loop}
cd /root/repo
mkdir -p "$ROOT"

run() {
  echo "=== $(date +%H:%M:%S) closed_loop $* ==="
  python scripts/closed_loop.py "$@" --root "$ROOT"
}

[ -f "$ROOT/split.json" ] || run build
[ -d "$ROOT/ckpt_stage0" ] || run stage0
[ -d "$ROOT/ckpt" ] || run train
[ -d "$ROOT/ckpt_distilled4" ] || run distill --extra-progressive
[ -d "$ROOT/ckpt_stage0_distilled" ] || run distill-stage0
# phase_eval writes the report to the repo root itself
run eval --variants video,video_s0distilled,video_turbo \
  --report-name CLOSED_LOOP_TURBO.json
echo "=== $(date +%H:%M:%S) DONE ==="
