r"""A/B the interleaved EF encoder/forecaster vs the staged form on TPU.

Measures the full flagship train step (bench.py's marginal-cost protocol)
for each flag combination. Motivation: the staged form pays ~8 x ~1 ms
full-tensor relayout copies at batched-conv <-> unrolled-scan boundaries
(STATUS.md, optimized-HLO dive); the interleaved form keeps each per-step
subgraph in one layout at the cost of t-times-smaller stage convs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_interleaved.py [model_id]
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import measure_ours  # noqa: E402  (repo-root import)

VARIANTS = [
    ("staged", {}),
    ("inter-fc", {"interleaved_forecast": True}),
    ("inter-enc", {"interleaved_encode": True}),
    ("inter-both", {"interleaved_forecast": True, "interleaved_encode": True}),
]


def main():
    model_id = sys.argv[1] if len(sys.argv) > 1 else "convlstm-shi"
    results = {}
    for name, kwargs in VARIANTS:
        r = measure_ours(steps=20, model_id=model_id, model_kwargs=kwargs)
        results[name] = r
        print(f"{model_id} {name:11s}: train {r['train_step_ms']:.2f} ms/step "
              f"({r['train_fps']:.1f} f/s, mfu {r['mfu']}) | "
              f"infer {r['infer_step_ms']:.2f} ms", flush=True)
    base = results["staged"]["train_step_ms"]
    best = min(results, key=lambda k: results[k]["train_step_ms"])
    print(json.dumps({"model": model_id, "best": best,
                      "speedup_vs_staged": round(
                          base / results[best]["train_step_ms"], 4)}))


if __name__ == "__main__":
    main()
