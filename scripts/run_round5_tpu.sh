#!/bin/bash
# Round-5 TPU measurement playbook — run the moment the axon tunnel is back.
# Sequential (1-core host). Logs under /tmp/r5_tpu/.
#   bash scripts/run_round5_tpu.sh
set -u
OUT=/tmp/r5_tpu
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== 1. probe (fail fast if tunnel is down)"
timeout 420 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices(), flush=True)
print(float(np.asarray(jnp.dot(jnp.ones((8,8)),jnp.ones((8,8)))[0,0])))
" || { echo "TUNNEL DOWN — aborting"; exit 1; }

echo "=== 2. PredRNN++ time-loop unroll A/B (VERDICT r4 #6)"
timeout 7200 python scripts/bench_predrnn_unroll.py > "$OUT/predrnn_unroll.txt" 2>&1
echo "exit=$?"; grep -v WARNING "$OUT/predrnn_unroll.txt"

echo "=== 3. UNet-3D roofline floor (VERDICT r4 #5)"
timeout 7200 python scripts/unet3d_roofline.py > "$OUT/unet3d_roofline.txt" 2>&1
echo "exit=$?"; grep -v WARNING "$OUT/unet3d_roofline.txt"

echo "=== 4. matched-step quality, ours bf16 on TPU (VERDICT r4 #10)"
timeout 7200 python scripts/matched_step_quality.py \
    --out scripts/results_matched_step_ours_tpu.json \
    > "$OUT/matched_step.txt" 2>&1
echo "exit=$?"; grep -v WARNING "$OUT/matched_step.txt" | tail -5

echo "=== 5. EF-TrajGRU trace of the new interleaved+clamp default"
timeout 7200 python scripts/profile_step.py --model trajgru --full-names \
    --json "$OUT/trajgru_profile.json" > "$OUT/trajgru_profile.txt" 2>&1
echo "exit=$?"; tail -20 "$OUT/trajgru_profile.txt"

echo "=== 5b. flagship trace of the new interleaved default"
timeout 7200 python scripts/profile_step.py --model convlstm-shi --full-names \
    --json "$OUT/convlstm_profile.json" > "$OUT/convlstm_profile.txt" 2>&1
echo "exit=$?"; tail -20 "$OUT/convlstm_profile.txt"

echo "=== 6. default bench sweep refresh (new interleaved defaults)"
timeout 10800 python bench.py > "$OUT/bench_default.json" 2> "$OUT/bench_default.err"
echo "exit=$?"; tail -1 "$OUT/bench_default.json"

echo "R5-TPU-DONE"
