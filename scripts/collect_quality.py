r"""Collects run_quality_suite.sh outputs into one JSON + markdown table.

Usage: python scripts/collect_quality.py [dir] — each <model>.json in the dir
holds the facade's stdout with the demo's final JSON summary as the tail.
"""
import json
import sys
from pathlib import Path

MODELS = ["convlstm-shi", "predrnn-pp", "phy", "unet-3d", "trajgru",
          "lstm", "st-phy", "min-conv-rnn", "pred-former", "simvp"]
METRIC_KEYS = [("mse (↓)", "mse"), ("psnr (↑)", "psnr"),
               ("ssim (↑)", "ssim"), ("lpips (↓)", "lpips_rf")]


def tail_json(path):
    r"""Extracts the trailing JSON object from mixed stdout."""
    text = Path(path).read_text()
    start = text.rfind("\n{")
    if start < 0:
        return None
    return json.loads(text[start:])


def main():
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vpt_quality_r04")
    rows = {}
    copy_row = None
    for model in MODELS:
        p = out_dir / f"{model}.json"
        if not p.exists():
            print(f"[missing] {p}", file=sys.stderr)
            continue
        try:
            summary = tail_json(p)
        except json.JSONDecodeError as e:
            print(f"[unparseable] {p}: {e}", file=sys.stderr)
            continue
        if not summary or "test_final_horizon" not in summary:
            print(f"[incomplete] {p}", file=sys.stderr)
            continue
        horizon = summary["test_final_horizon"]
        for name, metrics in horizon.items():
            entry = {short: metrics.get(k) for k, short in METRIC_KEYS}
            if name == "CopyLastFrame":
                copy_row = entry
            else:
                rows[model] = {"model_name": name,
                               "best_val_mse": summary.get("best_val_mse"),
                               **entry}

    result = {"config": "MMF 64x64 synthetic, 5ctx->10pred, batch 32, bf16, "
                        "5100 steps (17x300), horizon-10 test on 64 seqs; "
                        "lpips_rf = random-feature LPIPS (no pretrained "
                        "AlexNet in this environment)",
              "models": rows, "copy_last_frame": copy_row}
    out = Path(__file__).parent / (sys.argv[2] if len(sys.argv) > 2
                                   else "results_quality_r05.json")
    out.write_text(json.dumps(result, indent=2))
    print(f"wrote {out}")

    def fmt(v):
        return f"{v:.3f}" if isinstance(v, float) else "—"

    print("\n| Model | MSE ↓ | PSNR ↑ | SSIM ↑ | LPIPS-rf ↓ |")
    print("|---|---|---|---|---|")
    for model, r in rows.items():
        print(f"| {r['model_name']} | {fmt(r['mse'])} | {fmt(r['psnr'])} "
              f"| {fmt(r['ssim'])} | {fmt(r['lpips_rf'])} |")
    if copy_row:
        print(f"| CopyLastFrame | {fmt(copy_row['mse'])} | {fmt(copy_row['psnr'])} "
              f"| {fmt(copy_row['ssim'])} | {fmt(copy_row['lpips_rf'])} |")


if __name__ == "__main__":
    main()
