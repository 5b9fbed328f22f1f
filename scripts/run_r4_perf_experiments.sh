#!/bin/bash
# Round-4 perf experiment session (run on a free chip, sequentially):
#   1. interleaved EF encoder/forecaster A/B (flagship + EF-TrajGRU)
#   2. fused whole-scan ConvLSTM kernel re-measure (median-of-pairs timing)
# Logs under /tmp/r4_perf/.
set -u
OUT=/tmp/r4_perf
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== interleaved A/B: convlstm-shi"
timeout 3600 python scripts/bench_interleaved.py convlstm-shi \
    > "$OUT/interleaved_convlstm.txt" 2>&1
echo "exit=$?"; grep -v WARNING "$OUT/interleaved_convlstm.txt"

echo "=== interleaved A/B: trajgru"
timeout 5400 python scripts/bench_interleaved.py trajgru \
    > "$OUT/interleaved_trajgru.txt" 2>&1
echo "exit=$?"; grep -v WARNING "$OUT/interleaved_trajgru.txt"

echo "=== fused ConvLSTM kernel vs XLA scan (median-of-pairs)"
timeout 3600 python scripts/bench_fused_convlstm.py \
    > "$OUT/fused_convlstm.txt" 2>&1
echo "exit=$?"; grep -v WARNING "$OUT/fused_convlstm.txt"

echo "R4-PERF-DONE"
