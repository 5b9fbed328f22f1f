#!/bin/bash
# Quality table: train every trainable model on the MMF north-star
# config (5 ctx -> 10 pred, 64x64, batch 32, bf16, device-resident synthesis)
# and test with mse/psnr/ssim/lpips-rf at the 5100-step budget used in round 2
# (17 epochs x 300 steps).
#
# Run models SEQUENTIALLY (1-core host; concurrent runs pollute each other):
#   bash scripts/run_quality_suite.sh [outdir] [epochs] [steps]
set -u
OUT=${1:-/tmp/vpt_quality_r04}
EPOCHS=${2:-17}
STEPS=${3:-300}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

# Never-measured models first: if the tunnel dies mid-suite we still get
# the rows that have no prior-round numbers.
for MODEL in ${MODELS:-lstm st-phy min-conv-rnn pred-former simvp trajgru predrnn-pp convlstm-shi phy unet-3d}; do
  echo "=== $MODEL ==="
  timeout 14000 python scripts/train_mmnist_demo.py \
      --model "$MODEL" --epochs "$EPOCHS" --steps "$STEPS" \
      --out "$OUT/$MODEL" > "$OUT/$MODEL.json" 2> "$OUT/$MODEL.err"
  echo "exit=$? ($MODEL)"
  tail -c 400 "$OUT/$MODEL.err" | tail -2
done
echo "ALL-DONE"
