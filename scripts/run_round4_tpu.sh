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

echo "=== 3b. full-model inference: fused-scan flag vs default"
timeout 3600 python - > "$OUT/fused_model_infer.txt" 2>&1 <<'PY'
import time
import numpy as np
import jax, jax.numpy as jnp
from vp_suite_tpu.utils.utils import enable_compilation_cache
enable_compilation_cache()
from vp_suite_tpu.models import MODEL_CLASSES
from vp_suite_tpu.training.train_state import create_train_state
from vp_suite_tpu.training.loop import make_predict_fn
import optax

for fused in (False, True):
    model = MODEL_CLASSES["convlstm-shi"](
        img_shape=(3, 64, 64), action_size=0, tensor_value_range=(0.0, 1.0),
        compute_dtype=jnp.bfloat16, use_fused_scan=fused)
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    state = create_train_state(model, opt, jax.random.PRNGKey(0),
                               context_frames=5, pred_frames=10)
    predict = make_predict_fn(model, {"context_frames": 5, "pred_frames": 10,
                                      "use_actions": False})
    rng = np.random.RandomState(0)
    batch = {"frames": jax.device_put(rng.rand(32, 15, 64, 64, 3).astype(np.float32)),
             "actions": jax.device_put(np.zeros((32, 15, 1), np.float32))}
    p, _ = predict(state, batch)
    float(np.asarray(p).reshape(-1)[0])
    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            p, _ = predict(state, batch)
        float(np.asarray(p).reshape(-1)[0])
        return time.perf_counter() - t0
    t_n, t_2n = run(10), run(20)
    ms = (t_2n - t_n) / 10 * 1000
    print(f"fused={fused}: infer {ms:.2f} ms/step "
          f"({32*15/ms*1000:.0f} frames/s)", flush=True)

# the fused path is differentiable (custom VJP): A/B the TRAIN step too
from vp_suite_tpu.training.loop import make_train_step
from vp_suite_tpu.measure.loss_provider import PredictionLossProvider
for fused in (False, True):
    model = MODEL_CLASSES["convlstm-shi"](
        img_shape=(3, 64, 64), action_size=0, tensor_value_range=(0.0, 1.0),
        compute_dtype=jnp.bfloat16, use_fused_scan=fused)
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    state = create_train_state(model, opt, jax.random.PRNGKey(0),
                               context_frames=5, pred_frames=10)
    lp = PredictionLossProvider({"losses_and_scales": {"mse": 1.0},
                                 "img_c": 3, "device": None})
    step = make_train_step(model, {"context_frames": 5, "pred_frames": 10,
                                   "use_actions": False}, opt, lp,
                           donate=False)
    rng = np.random.RandomState(0)
    batch = {"frames": jax.device_put(rng.rand(32, 15, 64, 64, 3).astype(np.float32)),
             "actions": jax.device_put(np.zeros((32, 15, 1), np.float32))}
    epoch = jnp.asarray(0.0)
    state, m = step(state, batch, epoch)
    float(np.asarray(m["total"]))
    def trun(n):
        global state
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, batch, epoch)
        float(np.asarray(m["total"]))
        return time.perf_counter() - t0
    t_n, t_2n = trun(10), trun(20)
    ms = (t_2n - t_n) / 10 * 1000
    print(f"fused={fused}: TRAIN {ms:.2f} ms/step "
          f"({32*15/ms*1000:.0f} frames/s)", flush=True)
PY
echo "exit=$?"; cat "$OUT/fused_model_infer.txt"

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
