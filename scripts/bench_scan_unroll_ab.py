r"""A/B full time-loop unroll on the remaining scan models (round 5).

PredRNN++'s A/B (``bench_predrnn_unroll.py``) showed full unroll removes
the scan-boundary relayout copies: 157.2 -> 142.8 ms/step. PhyDNet (31%
of its step in layout copies) and ST-Phy are the other recurrent bench
models with the ``scan_unroll`` knob; this measures unroll=1 vs auto-full
at the bench config for each and prints one JSON line per model.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/bench_scan_unroll_ab.py [model ...]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import measure_ours  # noqa: E402  (repo-root import)


def main():
    models = sys.argv[1:] or ["phy", "st-phy"]
    out = {}
    for mid in models:
        a = measure_ours(steps=20, model_id=mid,
                         model_kwargs={"scan_unroll": 1})
        b = measure_ours(steps=20, model_id=mid,
                         model_kwargs={"scan_unroll": 0})
        out[mid] = {
            "unroll-1_ms": round(a["train_step_ms"], 2),
            "auto-full_ms": round(b["train_step_ms"], 2),
            "speedup": round(a["train_step_ms"] / b["train_step_ms"], 4),
            "auto_full_fps": round(b["train_fps"], 1),
            "auto_full_mfu": b["mfu"],
        }
        print(json.dumps({mid: out[mid]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
