r"""Quality-parity baseline: train the PyTorch reference on the SAME MMF data.

Counterpart to ``scripts/train_mmnist_demo.py`` for VERDICT item 4: loads the
torch reference model (read-only import via tests/helpers/ref_loader), feeds
it the same synthetic Moving-MNIST stream (our native index-deterministic
generator, same BatchLoader shuffle seed -> identical batch order), trains
with the reference defaults (Adam, lr 1e-4), and evaluates MSE/PSNR/SSIM on
the same 64 test sequences with OUR jax measures on CPU (identical metric
implementations for both frameworks).

CPU-only (no GPU in this environment; the reference has no TPU path), so step
counts are necessarily small — pass --steps to taste; the JSON log records
per-eval-step metrics so curves can be compared at matched step counts.

Usage: python scripts/torch_ref_quality.py --model convlstm-shi --steps 60
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import numpy as np

REF_CLASSES = {
    "convlstm-shi": ("vp_suite.models.precipitation_nowcasting.ef_conv_lstm",
                     "EF_ConvLSTM"),
    "predrnn-pp": ("vp_suite.models.predrnn_v2", "PredRNN_V2"),
    "trajgru": ("vp_suite.models.precipitation_nowcasting.ef_traj_gru",
                "EF_TrajGRU"),
}


def evaluate(model, test_items, ctx, pred, torch, eval_bs=16):
    r"""Final-horizon MSE/PSNR/SSIM over the test set, via our jax measures
    (batched: one forward + one metric pass per eval_bs items)."""
    from vp_suite_tpu.measure.metric_provider import PredictionMetricProvider
    provider = PredictionMetricProvider(
        {"metrics": ["mse", "psnr", "ssim"], "img_c": 3, "device": "cpu",
         "context_frames": ctx, "pred_frames": pred})
    frames = np.stack([np.asarray(it["frames"]) for it in test_items])
    per_batch = []
    model.eval()
    with torch.no_grad():
        for s in range(0, len(frames), eval_bs):
            chunk = frames[s:s + eval_bs]
            x = torch.tensor(chunk[:, :ctx].transpose(0, 1, 4, 2, 3))
            preds, _ = model(x, pred_frames=pred)
            preds = preds.numpy().transpose(0, 1, 3, 4, 2)     # [n,p,h,w,c]
            target = chunk[:, ctx:ctx + pred]
            m = provider.get_metrics(preds, target, all_frame_cnts=True)
            per_batch.append((len(chunk), m[-1]))              # final horizon
    model.train()
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
    parser.add_argument("--out", default="/tmp/torch_ref_quality.json")
    args = parser.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from helpers.ref_loader import load_reference
    load_reference()
    import torch
    from vp_suite_tpu.datasets import MovingMNISTOnTheFly
    from vp_suite_tpu.training.data import BatchLoader

    ctx, pred = 5, 10
    train_ds = MovingMNISTOnTheFly("train", img_size=args.img, backend="native",
                                   digit_source="synthetic",
                                   n_seqs={"train": 9600, "val": 64, "test": 64})
    train_ds.set_seq_len(ctx, pred, 1)
    test_ds = MovingMNISTOnTheFly("test", img_size=args.img, backend="native",
                                  digit_source="synthetic", n_seqs=64)
    test_ds.set_seq_len(ctx, pred, 1)
    test_items = [test_ds[i] for i in range(len(test_ds))]

    # same loader seed as the facade run (run-config seed default 42) ->
    # identical batch order to the jax training run
    loader = BatchLoader(train_ds, args.batch, shuffle=True, seed=42,
                         drop_last=True)

    torch.manual_seed(42)
    mod_name, cls_name = REF_CLASSES[args.model]
    mod = __import__(mod_name, fromlist=[cls_name])
    model_cls = getattr(mod, cls_name)
    model = model_cls("cpu", img_shape=(3, args.img, args.img), action_size=0,
                      tensor_value_range=(0.0, 1.0))
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)

    log = {"model": args.model, "framework": "torch-reference-cpu",
           "batch": args.batch, "evals": []}
    step, t0 = 0, time.time()
    while step < args.steps:
        for batch in loader:
            frames = torch.tensor(batch["frames"].transpose(0, 1, 4, 2, 3))
            x, y = frames[:, :ctx], frames[:, ctx:ctx + pred]
            preds, model_losses = model(x, pred_frames=pred)
            loss = torch.nn.functional.mse_loss(preds, y)
            if model_losses:
                for v in model_losses.values():
                    loss = loss + v
            opt.zero_grad()
            loss.backward()
            opt.step()
            step += 1
            if step % args.eval_every == 0 or step == args.steps:
                metrics = evaluate(model, test_items, ctx, pred, torch)
                rec = {"step": step, "train_loss": float(loss.item()),
                       "wall_s": round(time.time() - t0, 1), **metrics}
                log["evals"].append(rec)
                print(json.dumps(rec), flush=True)
                with open(args.out, "w") as f:
                    json.dump(log, f, indent=2)
            if step >= args.steps:
                break
    print(f"done; log at {args.out}")


if __name__ == "__main__":
    main()
