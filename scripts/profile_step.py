r"""Capture + summarize a TPU profile of a model's train step.

Captures a ``jax.profiler`` trace around a few north-star train steps and
converts the xplane protobuf into an op-level time table via
``tensorboard_plugin_profile`` (installed in this image), printing the top-N
ops by self time — the data behind MFU work (VERDICT item 3).

Usage: python scripts/profile_step.py [--model convlstm-shi] [--top 25]
"""
import argparse
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def capture(model_id, img, ctx, pred, batch, steps, out_dir):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from vp_suite_tpu.utils.utils import enable_compilation_cache
    enable_compilation_cache()
    from vp_suite_tpu.models import MODEL_CLASSES
    from vp_suite_tpu.training.train_state import create_train_state
    from vp_suite_tpu.training.loop import make_train_step
    from vp_suite_tpu.measure.loss_provider import PredictionLossProvider

    kwargs = dict(img_shape=(3, img, img), action_size=0,
                  tensor_value_range=(0.0, 1.0), compute_dtype=jnp.bfloat16,
                  remat=True)
    model = MODEL_CLASSES[model_id](**kwargs)
    run_config = {"context_frames": ctx, "pred_frames": pred, "use_actions": False}
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               context_frames=ctx, pred_frames=pred)
    loss_provider = PredictionLossProvider(
        {"losses_and_scales": {"mse": 1.0}, "img_c": 3, "device": None})
    step = make_train_step(model, run_config, optimizer, loss_provider,
                           donate=False)
    rng = np.random.RandomState(0)
    batch_np = {"frames": rng.rand(batch, ctx + pred, img, img, 3).astype(np.float32),
                "actions": np.zeros((batch, ctx + pred, 1), np.float32)}
    db = {k: jax.device_put(v) for k, v in batch_np.items()}
    epoch = jnp.asarray(0.0)
    state, m = step(state, db, epoch)          # compile
    float(np.asarray(m["total"]))
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        state, m = step(state, db, epoch)
    float(np.asarray(m["total"]))
    jax.profiler.stop_trace()


def summarize(out_dir, top):
    xplanes = glob.glob(f"{out_dir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        print("no xplane captured (device tracing unsupported on this backend?)")
        return
    xplane = max(xplanes, key=lambda p: Path(p).stat().st_size)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd
    data, _ = rttd.xspace_to_tool_data([xplane], "framework_op_stats", {})
    try:
        table = json.loads(data)
    except Exception:
        # gviz csv fallback
        print(data[:4000])
        return
    rows = table
    print(f"top {top} ops by total self time:")
    print(rows if isinstance(rows, str) else json.dumps(rows)[:6000])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="convlstm-shi")
    parser.add_argument("--img", type=int, default=64)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--out", default="/tmp/vpt_profile")
    parser.add_argument("--summarize-only", action="store_true")
    args = parser.parse_args()
    if not args.summarize_only:
        capture(args.model, args.img, 5, 10, args.batch, args.steps, args.out)
    summarize(args.out, args.top)


if __name__ == "__main__":
    main()
