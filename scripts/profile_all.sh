#!/bin/bash
# Device-trace EVERY bench config and emit per-model bound-by JSON
# (scripts/profile_step.py --json) for the STATUS.md "bound-by" table
# (VERDICT r3 item #5: a trace-backed bound-by column for every config).
#
# Shapes match bench.py's sweep (img 64, 5 ctx -> 10 pred, batch 32, bf16);
# per-model kwargs mirror bench.MODEL_PERF_CFG / its special cases.
# Sequential — 1-core host.
#   bash scripts/profile_all.sh [outdir]
set -u
OUT=${1:-/tmp/r4_profiles}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

run() {  # run <model-id> [extra profile_step args...]
  local M=$1; shift
  echo "=== $M"
  timeout 2400 python scripts/profile_step.py --model "$M" \
      --out "$OUT/trace_$M" --json "$OUT/$M.json" "$@" \
      > "$OUT/$M.txt" 2>&1
  echo "exit=$? ($M)"; grep -A8 "bound-by rollup" "$OUT/$M.txt" | head -10
}

run convlstm-shi
run trajgru
run predrnn-pp --no-remat
run phy
run unet-3d --model-kwarg temporal_dim=3
run lstm
run st-phy
run min-conv-rnn
run pred-former
run simvp
echo "ALL-PROFILES-DONE"
