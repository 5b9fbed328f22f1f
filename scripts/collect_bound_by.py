r"""Merge scripts/profile_all.sh per-model JSON into the STATUS.md
"bound-by" table (VERDICT r3 item #5).

Usage: python scripts/collect_bound_by.py [dir]

For each model: total device self-time per step, the top category's share,
and a verdict string — "mxu" (MXU-bound: mxu+fusion >= 60%), "layout" when
copies/reshapes eat > 20% (the EF-TrajGRU round-3 lesson), else the largest
category. Prints a markdown table + writes <dir>/bound_by.json.
"""
import json
import sys
from pathlib import Path

MODELS = ["convlstm-shi", "trajgru", "predrnn-pp", "phy", "unet-3d",
          "lstm", "st-phy", "min-conv-rnn", "pred-former", "simvp"]


def verdict(cats, total):
    share = {c: us / total for c, us in cats.items()}
    mxu = share.get("mxu", 0) + share.get("custom-call (pallas)", 0)
    if share.get("layout", 0) > 0.20:
        return f"layout copies ({share['layout']:.0%})"
    if mxu >= 0.60:
        return f"MXU compute ({mxu:.0%})"
    if share.get("fusion", 0) >= 0.5:
        return f"fused elementwise/HBM ({share['fusion']:.0%})"
    top = max(share, key=share.get)
    return f"{top} ({share[top]:.0%})"


def main():
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4_profiles")
    rows = {}
    for model in MODELS:
        p = out_dir / f"{model}.json"
        if not p.exists():
            continue
        d = json.loads(p.read_text())
        total = d["total_ms_per_step"]
        cats = d["categories_ms_per_step"]
        rows[model] = {"total_ms": round(total, 2),
                       "categories_ms": {c: round(v, 2)
                                         for c, v in cats.items()},
                       "bound_by": verdict(cats, total)}
    (out_dir / "bound_by.json").write_text(json.dumps(rows, indent=1))
    print("| Model | device self-time (ms/step) | bound by |")
    print("|---|---|---|")
    for model, r in rows.items():
        print(f"| {model} | {r['total_ms']} | {r['bound_by']} |")


if __name__ == "__main__":
    main()
