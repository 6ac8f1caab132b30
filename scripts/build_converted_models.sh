#!/usr/bin/env bash
# Batch-convert an LTX-2 snapshot into 4/8-bit TPU-native checkpoints
# (reference workflow: scripts/build_converted_models.sh).
set -euo pipefail

ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
OUT="${OUT:-$ROOT/converted}"
HF_REPO="${HF_REPO:-Lightricks/LTX-2}"
ENABLE_2BIT="${ENABLE_2BIT:-0}"
PY="${PY:-python}"

echo "==> Resolving snapshot for $HF_REPO"
MODEL_PATH="$(PYTHONPATH="$ROOT:${PYTHONPATH:-}" "$PY" - <<PY
from mlx_video_tpu.utils.hub import get_model_path
print(get_model_path("$HF_REPO"))
PY
)"

mkdir -p "$OUT"
for kind in dev distilled; do
  for bits in 8 4; do
    dest="$OUT/ltx2-$kind-${bits}bit-tpu"
    echo "==> $kind $bits-bit -> $dest"
    mkdir -p "$dest"
    PYTHONPATH="$ROOT:${PYTHONPATH:-}" "$PY" -m mlx_video_tpu.cli.convert \
      --input "$MODEL_PATH/ltx-2-19b-$kind.safetensors" \
      --output "$dest/ltx-2-19b-$kind-${bits}bit-mlx.safetensors" \
      --model-type av --quantize-bits "$bits" --quantize-scope core
  done
done
if [ "$ENABLE_2BIT" = "1" ]; then
  dest="$OUT/ltx2-distilled-2bit-tpu"
  mkdir -p "$dest"
  PYTHONPATH="$ROOT:${PYTHONPATH:-}" "$PY" -m mlx_video_tpu.cli.convert \
    --input "$MODEL_PATH/ltx-2-19b-distilled.safetensors" \
    --output "$dest/ltx-2-19b-distilled-2bit-mlx.safetensors" \
    --model-type av --quantize-bits 2 --quantize-scope attn1
fi
echo "==> Done: $OUT"
