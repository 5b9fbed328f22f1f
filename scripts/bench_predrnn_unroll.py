r"""A/B PredRNN++'s time-loop unroll on TPU.

The round-4 trace rollup puts 23% of PredRNN++'s 157 ms step in layout
copies at 80% MFU — the only slack left. The whole model is ONE lax.scan
over time (models/predrnn_v2.py), so those copies sit at scan-boundary
layout switches (sliced xs/stacked ys vs body layouts). A fully unrolled
loop gives XLA one flat graph to lay out; unroll=2 halves the boundary
count. EF-ConvLSTM regressed at unroll=2 (CLAUDE.md), but PredRNN++'s body
is 4x bigger (3 stacked ST-LSTM cells at 128ch), so the trade-off can land
differently.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_predrnn_unroll.py
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import measure_ours  # noqa: E402  (repo-root import)

VARIANTS = [("unroll-1", 1), ("unroll-2", 2), ("unroll-full", 0)]


def main():
    results = {}
    for name, unroll in VARIANTS:
        r = measure_ours(steps=20, model_id="predrnn-pp",
                         model_kwargs={"scan_unroll": unroll})
        results[name] = r
        print(f"predrnn-pp {name:11s}: train {r['train_step_ms']:.2f} ms/step "
              f"({r['train_fps']:.1f} f/s, mfu {r['mfu']}) | "
              f"infer {r['infer_step_ms']:.2f} ms", flush=True)
    base = results["unroll-1"]["train_step_ms"]
    best = min(results, key=lambda k: results[k]["train_step_ms"])
    print(json.dumps({"model": "predrnn-pp", "best": best,
                      "speedup_vs_unroll1": round(
                          base / results[best]["train_step_ms"], 4)}))


if __name__ == "__main__":
    main()
