r"""Matched-step quality parity: OUR model vs the torch reference, same steps.

Closes the round-4 VERDICT "SSIM parity" question (weak #5 / ask #10): the
recorded torch baseline (``scripts/results_torch_ref_convlstm.json``) only
reaches step 60 (3.3 h on the 1-core CPU host), so comparing it against our
5,100-step run conflates framework parity with training length. This script
runs OUR model for the SAME 60-step schedule the torch run used:

- identical initial weights (``torch.manual_seed(42)`` reference model,
  mapped in via ``utils.torch_import.import_state_dict`` — the proven
  < 1e-4 converter),
- identical batch order (same MMF native generator, same
  ``BatchLoader(..., shuffle=True, seed=42)``),
- identical optimizer (Adam, lr 1e-4) and loss (MSE),
- identical eval protocol (same 64 test sequences, final-horizon
  MSE/PSNR/SSIM through the same jax measure implementations at
  steps 20/40/60).

The remaining deltas are framework numerics (bf16 TPU vs f64-accum CPU) and
backend — exactly what a parity claim should isolate.

Usage: python scripts/matched_step_quality.py [--steps 60] [--cpu] [--f32]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import numpy as np


def evaluate(predict, state, test_items, ctx, pred, eval_bs=16):
    r"""Final-horizon MSE/PSNR/SSIM over the test set — mirrors
    ``torch_ref_quality.evaluate`` (same provider, same batching)."""
    from vp_suite_tpu.measure.metric_provider import PredictionMetricProvider
    provider = PredictionMetricProvider(
        {"metrics": ["mse", "psnr", "ssim"], "img_c": 3, "device": None,
         "context_frames": ctx, "pred_frames": pred})
    frames = np.stack([np.asarray(it["frames"]) for it in test_items])
    per_batch = []
    for s in range(0, len(frames), eval_bs):
        chunk = frames[s:s + eval_bs]
        preds, _ = predict(state, {"frames": chunk})
        preds = np.asarray(preds, np.float32)
        target = chunk[:, ctx:ctx + pred]
        m = provider.get_metrics(preds, target, all_frame_cnts=True)
        per_batch.append((len(chunk), m[-1]))  # final horizon
    total = sum(n for n, _ in per_batch)
    return {k: float(sum(n * d[k] for n, d in per_batch) / total)
            for _, d0 in per_batch[:1] for k in d0}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="convlstm-shi")
    parser.add_argument("--steps", type=int, default=60)
    parser.add_argument("--eval-every", type=int, default=20)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--img", type=int, default=64)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--f32", action="store_true",
                        help="train f32 instead of the production bf16")
    parser.add_argument("--out", default="/tmp/matched_step_quality.json")
    args = parser.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vp_suite_tpu.utils.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import optax
    from vp_suite_tpu.datasets import MovingMNISTOnTheFly
    from vp_suite_tpu.measure.loss_provider import PredictionLossProvider
    from vp_suite_tpu.models import MODEL_CLASSES
    from vp_suite_tpu.training.data import BatchLoader
    from vp_suite_tpu.training.loop import make_predict_fn, make_train_step
    from vp_suite_tpu.training.train_state import create_train_state
    from vp_suite_tpu.utils.torch_import import import_state_dict

    ctx, pred = 5, 10
    train_ds = MovingMNISTOnTheFly("train", img_size=args.img, backend="native",
                                   digit_source="synthetic",
                                   n_seqs={"train": 9600, "val": 64, "test": 64})
    train_ds.set_seq_len(ctx, pred, 1)
    test_ds = MovingMNISTOnTheFly("test", img_size=args.img, backend="native",
                                  digit_source="synthetic", n_seqs=64)
    test_ds.set_seq_len(ctx, pred, 1)
    test_items = [test_ds[i] for i in range(len(test_ds))]
    loader = BatchLoader(train_ds, args.batch, shuffle=True, seed=42,
                         drop_last=True)

    # identical initial weights: reconstruct the torch run's seed-42 init and
    # map it through the proven converter
    from helpers.ref_loader import load_reference
    load_reference()
    import torch
    torch.manual_seed(42)
    from vp_suite.models.precipitation_nowcasting.ef_conv_lstm import EF_ConvLSTM
    ref = EF_ConvLSTM("cpu", img_shape=(3, args.img, args.img), action_size=0,
                      tensor_value_range=(0.0, 1.0))
    variables = import_state_dict(args.model, ref.state_dict())
    del ref

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    model = MODEL_CLASSES[args.model](
        img_shape=(3, args.img, args.img), action_size=0,
        tensor_value_range=(0.0, 1.0), compute_dtype=dtype)
    run_config = {"context_frames": ctx, "pred_frames": pred,
                  "use_actions": False}
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(42),
                               context_frames=ctx, pred_frames=pred)
    state = state.replace(params=variables["params"])
    loss_provider = PredictionLossProvider(
        {"losses_and_scales": {"mse": 1.0}, "img_c": 3, "device": None})
    train_step = make_train_step(model, run_config, optimizer, loss_provider,
                                 donate=False)
    predict = make_predict_fn(model, run_config)

    log = {"model": args.model,
           "framework": f"vp-suite-tpu ({'f32' if args.f32 else 'bf16'}, "
                        f"{jax.devices()[0].platform})",
           "batch": args.batch, "init": "torch seed-42 (imported)",
           "evals": []}
    epoch = jnp.asarray(0.0)
    step, t0 = 0, time.time()
    while step < args.steps:
        for batch_np in loader:
            batch = {"frames": jnp.asarray(batch_np["frames"]),
                     "actions": jnp.zeros((args.batch, ctx + pred, 1),
                                          jnp.float32)}
            state, metrics = train_step(state, batch, epoch)
            step += 1
            if step % args.eval_every == 0 or step == args.steps:
                m = evaluate(predict, state, test_items, ctx, pred)
                rec = {"step": step,
                       "train_loss": float(np.asarray(metrics["total"])),
                       "wall_s": round(time.time() - t0, 1), **m}
                log["evals"].append(rec)
                print(json.dumps(rec), flush=True)
                with open(args.out, "w") as f:
                    json.dump(log, f, indent=2)
            if step >= args.steps:
                break
    print(f"done; log at {args.out}")


if __name__ == "__main__":
    main()
