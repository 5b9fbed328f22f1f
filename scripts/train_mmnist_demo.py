r"""Quality demo: train EF-ConvLSTM on Moving MNIST (north-star config) and
compare test metrics against the CopyLastFrame baseline.

Usage: python scripts/train_mmnist_demo.py [--epochs N] [--steps N] [--cpu]
Prints a JSON summary (final val loss + per-model test metrics).
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--steps", type=int, default=100, help="steps per epoch")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--img", type=int, default=64)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--out", default="/tmp/vp_mmnist_demo")
    parser.add_argument("--resume", action="store_true",
                        help="continue from the checkpoint in --out")
    parser.add_argument("--skip-test", action="store_true")
    parser.add_argument("--model", default="convlstm-shi",
                        help="model registry id to train")
    parser.add_argument("--backend", default="device",
                        help="MMF generation backend: device (TPU-resident, "
                             "fastest) | native | numpy")
    args = parser.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from vp_suite_tpu import VPSuite
    suite = VPSuite()
    suite.load_dataset("MMF", img_size=args.img, backend=args.backend,
                       digit_source="synthetic",
                       n_seqs={"train": 9600, "val": 64, "test": 64})
    from pathlib import Path as _P
    if args.resume and (_P(args.out) / "best_model").exists():
        suite.load_model(args.out, "best_model")
    else:
        # UNet-3D's temporal_dim is a REQUIRED_ARG the dataset can't provide;
        # SimVP's translator width is in_frames*hid_s — give it the full context
        extra = {"temporal_dim": 3} if args.model == "unet-3d" else \
            {"in_frames": 5} if args.model == "simvp" else {}
        suite.create_model(args.model, **extra)
    best = suite.train(epochs=args.epochs, batch_size=args.batch,
                       context_frames=5, pred_frames=10,
                       steps_per_epoch=args.steps, no_vis=True, no_wandb=True,
                       compute_dtype="bfloat16", out_dir=args.out,
                       log_every=25)

    if args.skip_test:
        print(json.dumps({"best_val_mse": best}))
        return
    suite.load_dataset("MMF", split="test", img_size=args.img, backend="native",
                       digit_source="synthetic", n_seqs=64)
    # lpips here runs on deterministic random features (no pretrained
    # AlexNet in this zero-egress environment) — a valid within-comparison
    # perceptual distance, labeled LPIPS-rf in the tables
    results = suite.test(brief_test=False, context_frames=5, pred_frames=10,
                         no_wandb=True, no_vis=True,
                         metrics=["mse", "psnr", "ssim", "lpips"])
    summary = {"best_val_mse": best,
               "test_final_horizon": {k: v[-1] for k, v in results[0].items()}}
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
