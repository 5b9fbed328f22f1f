#!/bin/bash
# Round-4 TPU measurement playbook — run the moment the axon tunnel is back.
# Sequential (1-core host). Logs under /tmp/r4_tpu/.
#   bash scripts/run_round4_tpu.sh
set -u
OUT=/tmp/r4_tpu
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

echo "=== 1. probe (fail fast if tunnel is down)"
timeout 420 python -c "
import jax, numpy as np, jax.numpy as jnp
print(jax.devices(), flush=True)
print(float(np.asarray(jnp.dot(jnp.ones((8,8)),jnp.ones((8,8)))[0,0])))
" || { echo "TUNNEL DOWN — aborting"; exit 1; }

echo "=== 2. default bench sweep (all 7 configs + e2e -> BENCH_ALL.jsonl)"
timeout 7200 python bench.py > "$OUT/bench_default.json" 2> "$OUT/bench_default.err"
echo "exit=$?"; tail -1 "$OUT/bench_default.json"

echo "=== 3. fused ConvLSTM scan kernel vs XLA scan"
timeout 3600 python scripts/bench_fused_convlstm.py > "$OUT/fused_convlstm.txt" 2>&1
echo "exit=$?"; cat "$OUT/fused_convlstm.txt"

echo "=== 4. profiles: unet-3d (rebuilt), phy, flagship"
timeout 2400 python scripts/profile_step.py --model unet-3d --model-kwarg temporal_dim=3 \
    --out /tmp/prof_unet > "$OUT/profile_unet3d.txt" 2>&1; echo "unet exit=$?"
timeout 2400 python scripts/profile_step.py --model phy \
    --out /tmp/prof_phy > "$OUT/profile_phy.txt" 2>&1; echo "phy exit=$?"
timeout 2400 python scripts/profile_step.py --model convlstm-shi \
    --out /tmp/prof_flagship > "$OUT/profile_flagship.txt" 2>&1; echo "flagship exit=$?"

echo "=== 5. quality suite (8 models x 17x300 steps) — LONG (hours)"
bash scripts/run_quality_suite.sh /tmp/vpt_quality_r04 17 300 \
    > "$OUT/quality_suite.log" 2>&1
echo "exit=$?"
python scripts/collect_quality.py /tmp/vpt_quality_r04 | tee "$OUT/quality_table.txt"

echo "ROUND4-TPU-DONE"
