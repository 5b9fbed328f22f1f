#!/bin/bash
# Round-5 perf experiment session (sequential; one chip, 1-core host):
#   1. EF-TrajGRU warp band-mode A/B: branch-free 'clamp' (new default)
#      vs the round-4 'cond' dispatch (VERDICT r4 #2: 45% control-flow)
#   2. interleaved EF encoder/forecaster A/B (flagship + EF-TrajGRU)
#      (VERDICT r4 #3: the authored-but-never-recorded round-4 experiment)
#   3. fused whole-scan ConvLSTM kernel re-measure (median-of-pairs)
# Logs under /tmp/r5_perf/.
set -u
OUT=/tmp/r5_perf
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== trajgru band-mode A/B: clamp (default)"
timeout 5400 python bench.py --model trajgru --steps 20 \
    > "$OUT/trajgru_clamp.txt" 2>&1
echo "exit=$?"; grep -v WARNING "$OUT/trajgru_clamp.txt" | tail -3

echo "=== trajgru band-mode A/B: cond (round-4 behavior)"
VPT_WARP_BAND_MODE=cond timeout 5400 python bench.py --model trajgru --steps 20 \
    > "$OUT/trajgru_cond.txt" 2>&1
echo "exit=$?"; grep -v WARNING "$OUT/trajgru_cond.txt" | tail -3

echo "=== interleaved A/B: convlstm-shi"
timeout 3600 python scripts/bench_interleaved.py convlstm-shi \
    > "$OUT/interleaved_convlstm.txt" 2>&1
echo "exit=$?"; grep -v WARNING "$OUT/interleaved_convlstm.txt"

echo "=== interleaved A/B: trajgru (composes with clamp default)"
timeout 7200 python scripts/bench_interleaved.py trajgru \
    > "$OUT/interleaved_trajgru.txt" 2>&1
echo "exit=$?"; grep -v WARNING "$OUT/interleaved_trajgru.txt"

echo "=== fused ConvLSTM kernel vs XLA scan (median-of-pairs)"
timeout 3600 python scripts/bench_fused_convlstm.py \
    > "$OUT/fused_convlstm.txt" 2>&1
echo "exit=$?"; grep -v WARNING "$OUT/fused_convlstm.txt"

echo "R5-PERF-DONE"
