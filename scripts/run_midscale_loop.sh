#!/bin/bash
# VERDICT r4 item 2: scale the closed loop one notch toward production.
# Width 512 / 8 layers / 512 latent tokens (seq 8x513 = 4104), bf16
# compute with the production fp32 islands, attn_impl=auto (flash kernel
# on TPU), 16 held-out eval scenes. Chain: build -> train -> distill
# (+4-step) -> eval random,trained,distilled4 -> CLOSED_LOOP_MID.json.
# Stage 0 stays the frozen tiny VAE (the {video+3D} entry) — the item
# under test is numerics/kernels at width, not the anchor generator.
set -e -o pipefail
ROOT=${1:-/root/repo/experiments/closed_loop_mid}
cd /root/repo
mkdir -p "$ROOT"

SPEC="--spec denoiser_width=512 --spec denoiser_layers=8 \
 --spec denoiser_heads=8 --spec decoder_width=512 --spec decoder_layers=8 \
 --spec decoder_heads=8 --spec latent_tokens=512 --spec latent_channels=16 \
 --spec vae_width=128 --spec attn_impl=auto --spec compute_dtype=bfloat16"

run() {
  echo "=== $(date +%H:%M:%S) closed_loop $* ==="
  # shellcheck disable=SC2086
  python scripts/closed_loop.py "$@" --root "$ROOT" $SPEC \
    --n-train 48 --n-eval 16 --batch 8 \
    --flow-steps 2500 --decoder-steps 2500 --distill-steps 1000
}

[ -f "$ROOT/split.json" ] || run build
[ -d "$ROOT/ckpt" ] || run train
[ -d "$ROOT/ckpt_distilled4" ] || run distill --extra-progressive
run eval --variants random,trained,distilled4 --report-name CLOSED_LOOP_MID.json
echo "=== $(date +%H:%M:%S) DONE ==="
