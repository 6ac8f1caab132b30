#!/usr/bin/env bash
# Generate one clip with each locally converted 4/8-bit checkpoint
# (reference workflow: scripts/gen_4_local_models.sh).
set -euo pipefail

ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
CONVERTED="${CONVERTED:-$ROOT/converted}"
OUT="${OUT:-$ROOT/outputvideos}"
PROMPT="${PROMPT:-A cinematic panorama of a mountain landscape at sunrise, mist in the valleys, realistic lighting}"
TEXT_ENCODER_REPO="${TEXT_ENCODER_REPO:-Lightricks/LTX-2}"
PY="${PY:-python}"
EXTRA_ARGS=()
[[ "${MEM_LOG:-0}" == "1" ]] && EXTRA_ARGS+=(--mem-log)

mkdir -p "$OUT"
for kind in dev distilled; do
  for bits in 8 4; do
    dir="$CONVERTED/ltx2-$kind-${bits}bit-tpu"
    [ -d "$dir" ] || { echo "skip $dir (missing)"; continue; }
    args=(--prompt "$PROMPT" --checkpoint-path "$dir" --pipeline "$kind"
          --text-encoder-repo "$TEXT_ENCODER_REPO"
          --height 512 --width 512 --num-frames 33
          --output-path "$OUT/${kind}_${bits}bit.mp4")
    [ "$kind" = dev ] && args+=(--steps 25 --cfg-scale 4.0)
    echo "==> $kind $bits-bit"
    PYTHONPATH="$ROOT:${PYTHONPATH:-}" "$PY" -m mlx_video_tpu.cli.generate \
      "${args[@]}" "${EXTRA_ARGS[@]}"
  done
done
