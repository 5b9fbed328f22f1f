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


def capture(model_id, img, ctx, pred, batch, steps, out_dir, remat=True,
            model_kwargs=None):
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
                  remat=remat)
    model = MODEL_CLASSES[model_id](**kwargs, **(model_kwargs or {}))
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


#: op-name prefix -> category, for the bound-by rollup. Order matters
#: (first match wins). XLA:TPU op names are HLO opcode-prefixed.
_CATEGORIES = [
    # 'convert' (elementwise bf16/f32 casts) must match BEFORE the mxu
    # group: the bare 'conv' prefix would otherwise claim it (ADVICE r4)
    (("convert",), "elementwise"),
    (("convolution", "dot", "dot_general", "cublas", "conv"), "mxu"),
    (("fusion", "loop_fusion", "input_fusion", "output_fusion"), "fusion"),
    (("copy", "reshape", "transpose", "bitcast", "copy-start",
      "copy-done"), "layout"),
    (("dynamic-slice", "dynamic-update-slice", "gather", "scatter",
      "slice", "concatenate", "pad", "reverse"), "memory"),
    (("all-reduce", "all-gather", "reduce-scatter", "collective",
      "all-to-all", "ppermute", "send", "recv"), "collective"),
    (("custom-call",), "custom-call (pallas)"),
    # cond/while branch computations show as one opaque event absorbing
    # their body ops (e.g. the traced band-limit/exact warp fallback)
    (("branch", "conditional", "while", "body", "region"), "control-flow"),
]


def _category(name):
    low = name.lower()
    for prefixes, cat in _CATEGORIES:
        if any(low.startswith(p) for p in prefixes):
            return cat
    # XLA:TPU names fusions by their root ops ("multiply_reduce_fusion",
    # "copy_bitcast_fusion"): classify by the first op token, falling back
    # to the generic fusion bucket
    if "fusion" in low:
        head = low.split("_", 1)[0]
        for prefixes, cat in _CATEGORIES:
            if any(head.startswith(p) for p in prefixes):
                return cat
        return "fusion"
    return "other"


def summarize(out_dir, top, steps=1, strip_ids=True, emit_json=None):
    r"""Parses the Chrome trace (device events) directly: the installed
    tensorboard_plugin_profile converter is broken (protobuf mismatch), but
    the capture also writes ``*.trace.json.gz`` with the XLA-op timeline.
    Computes per-op SELF time with an interval stack (nested call ops like
    while/checkpoint otherwise absorb their children)."""
    import collections
    import gzip
    import re
    traces = glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no trace captured (device tracing unsupported on this backend?)")
        return
    with gzip.open(sorted(traces)[-1]) as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["args"].get("name") == "XLA Ops" and e["pid"] in tpu_pids}
    evs = sorted((e for e in events if e.get("ph") == "X"
                  and (e.get("pid"), e.get("tid")) in op_tids),
                 key=lambda e: (e["ts"], -e.get("dur", 0)))
    self_us = collections.Counter()
    cnt = collections.Counter()
    stack = []

    def base(n):
        return re.sub(r"\.\d+(\.clone)?$", "", n) if strip_ids else n

    for e in evs:
        ts, dur = e["ts"], e.get("dur", 0)
        while stack and ts >= stack[-1][1]:
            stack.pop()
        if stack:
            self_us[stack[-1][2]] -= dur
        name = base(e["name"])
        self_us[name] += dur
        cnt[name] += 1
        stack.append((ts, ts + dur, name))
    total = sum(self_us.values())
    print(f"total device self time: {total / 1000 / steps:.1f} ms/step")
    cat_us = collections.Counter()
    for name, us in self_us.items():
        cat_us[_category(name)] += us
    print("bound-by rollup (self-time share):")
    for cat, us in cat_us.most_common():
        print(f"  {us / total * 100:5.1f}%  {us / 1000 / steps:8.2f} ms/step  {cat}")
    for name, us in self_us.most_common(top):
        print(f"{us / 1000 / steps:9.2f} ms/step  x{cnt[name] // steps:5d}  {name[:90]}")
    if emit_json:
        with open(emit_json, "w") as f:
            json.dump({"total_ms_per_step": total / 1000 / steps,
                       "categories_ms_per_step": {
                           c: us / 1000 / steps for c, us in cat_us.items()},
                       "top_ops_ms_per_step": {
                           n: us / 1000 / steps
                           for n, us in self_us.most_common(top)}}, f, indent=1)
        print(f"wrote {emit_json}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="convlstm-shi")
    parser.add_argument("--img", type=int, default=64)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--out", default="/tmp/vpt_profile")
    parser.add_argument("--summarize-only", action="store_true")
    parser.add_argument("--full-names", action="store_true",
                        help="keep per-op HLO ids instead of grouping")
    parser.add_argument("--no-remat", action="store_true",
                        help="profile without scan-body remat (remat regions "
                             "show up as opaque 'checkpoint' events; this "
                             "exposes the per-op breakdown)")
    parser.add_argument("--json", default=None,
                        help="also write the summary (total, per-category, "
                             "top ops) as JSON to this path")
    parser.add_argument("--model-kwarg", action="append", default=[],
                        help="extra model kwarg as key=value (values parsed "
                             "as python literals: False/2/'gates'/...)")
    args = parser.parse_args()

    def _parse_val(v):
        import ast
        try:
            return ast.literal_eval(v)
        except (ValueError, SyntaxError):
            return v  # bare string (e.g. remat_policy=gates)

    mkw = {k: _parse_val(v)
           for k, v in (kv.split("=", 1) for kv in args.model_kwarg)}
    if not args.summarize_only:
        capture(args.model, args.img, 5, 10, args.batch, args.steps, args.out,
                remat=not args.no_remat, model_kwargs=mkw)
    summarize(args.out, args.top, steps=args.steps,
              strip_ids=not args.full_names, emit_json=args.json)


if __name__ == "__main__":
    main()
