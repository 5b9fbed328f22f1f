r"""Benchmark: ConvLSTM-Shi (EF) on Moving-MNIST shapes, 5 ctx → 10 pred.

The north-star config from BASELINE.json: frames/sec/chip for train+infer on
the flagship model. Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}``.

``vs_baseline`` compares against the PyTorch reference implementation's
training throughput measured once on this host's CPU and cached in
``bench_baseline.json`` (the reference has no GPU here and publishes no
numbers — SURVEY.md §6). Extra keys document the breakdown.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_CACHE = Path(__file__).parent / "bench_baseline.json"
BENCH_ALL_SIDECAR = Path(__file__).parent / "BENCH_ALL.jsonl"

# dense bf16 peak FLOP/s per chip, keyed by substrings of device_kind.
# Used for the ``mfu`` field: executed-FLOP utilization (XLA cost analysis of
# the compiled step, which counts rematerialized FLOPs — i.e. hardware FLOP
# utilization, a slight over-count of "model FLOPs" when remat=True).
_PEAK_FLOPS = [
    ("v5 lite", 197e12), ("v5e", 197e12),
    ("v5p", 459e12), ("v6", 918e12), ("v4", 275e12),
]


def _peak_flops(device):
    if device.platform != "tpu":
        return None
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in _PEAK_FLOPS:
        if sub in kind:
            return peak
    return 197e12  # default to v5e if the kind string is unrecognised


def _cost_flops(lowerable, *args):
    r"""Executed matmul/conv FLOPs of one call, via the jaxpr walker
    (``vp_suite_tpu.utils.flops``). NOT XLA cost_analysis: that counts a
    scan body once regardless of trip count, under-reporting every recurrent
    model here by the sequence length (verified empirically)."""
    try:
        from vp_suite_tpu.utils.flops import count_flops
        flops = float(count_flops(lowerable, *args))
        return flops if flops > 0 else None
    except Exception:
        return None


# Per-model measured-best perf settings, applied when the caller keeps the
# defaults (an explicit --no-remat etc. still wins). predrnn-pp: selective
# remat costs 163.7 vs 158.0 ms/step at the bench shape (b32 64x64) and HBM
# fits without it; the model class keeps remat=True for real (larger) runs.
MODEL_PERF_CFG = {"predrnn-pp": {"remat": False}}


def measure_ours(img=64, ctx=5, pred=10, batch=32, steps=20, compute_dtype="bfloat16",
                 platform=None, remat=True, use_pallas=False, model_id="convlstm-shi",
                 unroll=None, donate=True, model_kwargs=None):
    if remat:  # caller didn't force --no-remat; apply the per-model best
        remat = MODEL_PERF_CFG.get(model_id, {}).get("remat", remat)
    model_kwargs = {**MODEL_PERF_CFG.get(model_id, {}).get("model_kwargs", {}),
                    **(model_kwargs or {})}
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    from vp_suite_tpu.utils.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    import optax
    from vp_suite_tpu.models import MODEL_CLASSES
    from vp_suite_tpu.training.train_state import create_train_state
    from vp_suite_tpu.training.loop import make_train_step, make_predict_fn
    from vp_suite_tpu.measure.loss_provider import PredictionLossProvider

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    kwargs = dict(img_shape=(3, img, img), action_size=0,
                  tensor_value_range=(0.0, 1.0), compute_dtype=dtype, remat=remat)
    if model_id == "convlstm-shi":
        kwargs["use_pallas"] = use_pallas
        if unroll is not None:
            kwargs["scan_unroll"] = unroll
    if model_id == "unet-3d":
        kwargs["temporal_dim"] = min(ctx, 3)
    if model_id == "simvp":
        # the translator's input projection is in_frames*hid_s wide — give it
        # the full context so the "5ctx" label stays honest
        kwargs["in_frames"] = ctx
    if model_id == "copy":
        kwargs = dict(img_shape=(3, img, img), action_size=0,
                      tensor_value_range=(0.0, 1.0))
    model = MODEL_CLASSES[model_id](**{**kwargs, **model_kwargs})
    run_config = {"context_frames": ctx, "pred_frames": pred, "use_actions": False}
    trainable = model_id != "copy"
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               context_frames=ctx, pred_frames=pred)
    if trainable:
        loss_provider = PredictionLossProvider(
            {"losses_and_scales": {"mse": 1.0}, "img_c": 3, "device": None})
        # donate the state like the facade's real train loop does (buffer
        # aliasing for params/opt state); the timing loops below thread the
        # returned state instead of reusing the donated one
        train_step = make_train_step(model, run_config, optimizer, loss_provider,
                                     donate=donate)
    predict = make_predict_fn(model, run_config)

    rng = np.random.RandomState(0)
    total = ctx + pred
    batch_np = {
        "frames": rng.rand(batch, total, img, img, 3).astype(np.float32),
        "actions": np.zeros((batch, total, 1), np.float32),
    }
    device_batch = {k: jax.device_put(v) for k, v in batch_np.items()}
    epoch = jnp.asarray(0.0)

    # train throughput. Synchronization via a host fetch of the final loss:
    # on the axon remote-TPU backend, jax.block_until_ready does NOT actually
    # wait for device execution (verified empirically: it reports sub-ms
    # "steps" while a forced device->host transfer shows the true ~100ms),
    # while a host fetch cannot complete before the whole dependent
    # computation has. Marginal cost (T(2N)-T(N))/N cancels the constant
    # dispatch/transfer overhead.
    def sync(mm):
        return float(np.asarray(mm["total"]))

    def timed_run(n):
        nonlocal state
        # thread the returned state (inputs are donated; reusing a consumed
        # buffer across timed runs would error)
        t0 = time.perf_counter()
        for _ in range(n):
            state, mm = train_step(state, device_batch, epoch)
        sync(mm)
        return time.perf_counter() - t0

    train_flops = None
    if trainable:
        train_flops = _cost_flops(train_step, state, device_batch, epoch)
        state, m = train_step(state, device_batch, epoch)  # compile
        sync(m)
        t_n = timed_run(steps)
        t_2n = timed_run(2 * steps)
        # marginal cost cancels constant dispatch overhead, but degenerates
        # when timing noise makes t_2n ~ t_n (seen on CPU smoke runs): fall
        # back to the plain average when the marginal estimate is implausible
        marginal = (t_2n - t_n) / steps
        avg = t_2n / (2 * steps)
        train_dt = marginal if marginal > 0.2 * avg else avg
        train_fps = batch * total / train_dt
    else:
        train_dt, train_fps = None, None

    # inference throughput: per-call host-fetch-synced timing. This includes
    # the host round-trip per call (an over-estimate of pure device time, i.e.
    # an honest upper bound on latency) — chained-dependency tricks are either
    # elided by the compiler or dominated by eager-op round-trips on the
    # remote backend.
    preds, _ = predict(state, device_batch)  # compile
    float(preds[0, 0, 0, 0, 0])  # scalar fetch: syncs without a bulk transfer
    t0 = time.perf_counter()
    for _ in range(steps):
        p, _ = predict(state, device_batch)
        float(p[0, 0, 0, 0, 0])
    infer_dt = (time.perf_counter() - t0) / steps
    infer_fps = batch * total / infer_dt

    peak = _peak_flops(jax.devices()[0])
    mfu = (train_flops / train_dt / peak) if (train_flops and train_dt and peak) \
        else None
    return {"train_fps": train_fps, "infer_fps": infer_fps,
            "train_step_ms": train_dt * 1e3 if train_dt else None,
            "infer_step_ms": infer_dt * 1e3,
            "train_flops_per_step": train_flops,
            "mfu": round(mfu, 4) if mfu else None,
            "platform": jax.devices()[0].platform, "compute_dtype": compute_dtype,
            "remat": remat, "use_pallas": use_pallas}


def measure_torch_reference(model_id="convlstm-shi", img=64, ctx=5, pred=10,
                            batch=4, steps=3):
    r"""Measures a PyTorch reference model's training throughput
    (fwd+loss+bwd+opt) on host CPU. Imports the reference read-only via the
    test loader stubs. Reference registry: vp_suite/models/__init__.py:14-28."""
    sys.path.insert(0, str(Path(__file__).parent / "tests"))
    from helpers.ref_loader import load_reference
    load_reference()
    import torch
    from vp_suite.models import MODEL_CLASSES as REF_MODELS

    torch.manual_seed(0)
    cls = REF_MODELS[model_id]
    extra = {"temporal_dim": min(ctx, 3)} if model_id == "unet-3d" else {}
    model = cls("cpu", img_shape=(3, img, img), action_size=0,
                tensor_value_range=(0.0, 1.0), **extra)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    total = ctx + pred
    frames = torch.rand(batch, total, 3, img, img)
    x, y = frames[:, :ctx], frames[:, ctx:]
    # NEEDS_COMPLETE_INPUT models (PredRNN) consume the full sequence
    inp = frames if getattr(cls, "NEEDS_COMPLETE_INPUT", False) else x

    def one_step():
        pred_frames, model_losses = model(inp, pred_frames=pred)
        loss = torch.nn.functional.mse_loss(pred_frames, y, reduction="none") \
            .sum(dim=(-1, -2, -3)).mean()
        if model_losses:
            for v in model_losses.values():
                loss = loss + v.mean()
        opt.zero_grad()
        loss.backward()
        opt.step()

    one_step()  # warm-up
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = (time.perf_counter() - t0) / steps
    return batch * total / dt  # frames/sec


def get_torch_baseline(refresh=False, model_id="convlstm-shi", **kwargs):
    r"""Per-model torch-CPU baseline fps, cached in bench_baseline.json.

    Cache layout: {"models": {model_id: fps|null}, "note": ...}; the legacy
    single-value key ``torch_cpu_train_fps`` is migrated to
    models["convlstm-shi"] on first read."""
    data = {}
    if BASELINE_CACHE.exists():
        with open(BASELINE_CACHE) as f:
            data = json.load(f)
    models = data.setdefault("models", {})
    if "torch_cpu_train_fps" in data and "convlstm-shi" not in models:
        models["convlstm-shi"] = data["torch_cpu_train_fps"]
    if model_id not in models or refresh:
        try:
            models[model_id] = measure_torch_reference(model_id=model_id, **kwargs)
        except Exception as e:
            models[model_id] = None
            data.setdefault("errors", {})[model_id] = str(e)
        data["note"] = ("PyTorch reference models, fwd+bwd+opt on host CPU, "
                        "batch 4 (no GPU in this environment)")
        with open(BASELINE_CACHE, "w") as f:
            json.dump(data, f, indent=2)
    return {"torch_cpu_train_fps": models.get(model_id), "note": data.get("note"),
            "baseline_model": model_id}


# the five BASELINE.json benchmark configs (driver regression tracking):
# model_id -> metric label. All MovingMNIST-compatible shapes (64x64 RGB,
# 5 ctx -> 10 pred, batch 32) so the r01 numbers stay comparable; 'copy' is
# the eval-only CopyLastFrame baseline.
ALL_CONFIGS = [
    ("copy", "CopyLastFrame MovingMNIST 5ctx->10pred eval frames/sec/chip"),
    ("convlstm-shi", "ConvLSTM-Shi MovingMNIST 5ctx->10pred train frames/sec/chip"),
    ("unet-3d", "UNet-3D KTH-shaped 5ctx->10pred train frames/sec/chip"),
    ("predrnn-pp", "PredRNN++ KTH-shaped 5ctx->10pred train frames/sec/chip"),
    ("phy", "PhyDNet BAIR-shaped 5ctx->10pred train frames/sec/chip"),
    # not a BASELINE.json config, but the repo's hardest kernel target —
    # regression-tracked alongside them (VERDICT r2 item #2)
    ("trajgru", "EF-TrajGRU MovingMNIST 5ctx->10pred train frames/sec/chip"),
    # TPU-native extra: time-PARALLEL recurrence (associative_scan) — no
    # reference analog, tracked to quantify the log-depth-context win
    ("min-conv-rnn", "MinConvRNN MovingMNIST 5ctx->10pred train frames/sec/chip"),
    # TPU-native extra: MXU-dense space-time transformer — no reference analog
    ("pred-former", "PredFormer MovingMNIST 5ctx->10pred train frames/sec/chip"),
    # TPU-native extra: ONE-SHOT conv translator (no scan at all) — tracked
    # to quantify the no-recurrence win at matched config
    ("simvp", "SimVP MovingMNIST 5ctx->10pred train frames/sec/chip"),
]


def run_all(args, emit=print):
    r"""Benchmarks every BASELINE.json config; one JSON line each.

    ``vs_baseline`` compares each model against ITS OWN torch-CPU reference
    baseline (measured once per model, cached); eval-only configs and models
    whose torch baseline failed report vs_baseline=0.
    """
    lines = []
    for model_id, metric in ALL_CONFIGS:
        if model_id == "copy":
            baseline = {"torch_cpu_train_fps": None,
                        "note": "eval-only baseline model, no torch train baseline",
                        "baseline_model": model_id}
        elif model_id in ("min-conv-rnn", "pred-former", "simvp"):
            baseline = {"torch_cpu_train_fps": None,
                        "note": "TPU-native extra, no torch reference analog",
                        "baseline_model": model_id}
        else:
            baseline = get_torch_baseline(refresh=args.refresh_baseline,
                                          model_id=model_id)
        base_fps = baseline.get("torch_cpu_train_fps")
        if args.smoke:
            ours = measure_ours(img=16, ctx=2, pred=2, batch=4, steps=2,
                                compute_dtype=args.dtype, platform=args.platform,
                                remat=not args.no_remat, model_id=model_id)
        else:
            ours = measure_ours(compute_dtype=args.dtype, platform=args.platform,
                                steps=args.steps, remat=not args.no_remat,
                                model_id=model_id)
        value = ours["train_fps"] if ours["train_fps"] else ours["infer_fps"]
        vs_baseline = (value / base_fps) if (base_fps and ours["train_fps"]) else 0.0
        line = {
            "metric": metric, "value": round(value, 2), "unit": "frames/sec",
            "vs_baseline": round(vs_baseline, 2),
            "baseline": f"PyTorch reference {model_id} on host CPU (no GPU available)",
            "detail": {**ours, "baseline_fps": base_fps, "model_id": model_id},
        }
        lines.append(line)
        emit(json.dumps(line), flush=True)
    return lines


def measure_e2e(args, emit=print):
    r"""End-to-end ``VPSuite.train`` throughput — what a USER gets from the
    facade (data synthesis + host loop + device step), not the isolated
    jitted step. North-star config on the MMF device-resident backend
    (batches generated ON the accelerator from PRNG keys; the 1-core host
    never touches frame data). Emits one JSON line; value = steady-state
    (last-epoch) frames/s. The torch baseline IS end-to-end (its train loop
    feeds a 4-worker DataLoader), so vs_baseline compares like for like."""
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from vp_suite_tpu import VPSuite

    smoke = args.smoke
    img, ctx, pred = (16, 2, 2) if smoke else (64, 5, 10)
    batch = 4 if smoke else 32
    steps = 3 if smoke else 300
    epochs = 2 if smoke else 3
    suite = VPSuite()
    suite.load_dataset("MMF", digit_source="synthetic", img_size=img,
                       backend="device",
                       n_seqs={"train": batch * steps, "val": batch,
                               "test": batch})
    suite.create_model("convlstm-shi", compute_dtype=jnp.bfloat16)
    suite.train(epochs=epochs, batch_size=batch, context_frames=ctx,
                pred_frames=pred, steps_per_epoch=steps, no_vis=True,
                no_wandb=True, vis_every=10 ** 6)
    fps = suite.models[-1].train_epoch_fps
    value = fps[-1]  # steady state: first epoch pays compilation
    baseline = (None if smoke
                else get_torch_baseline(refresh=args.refresh_baseline,
                                        model_id="convlstm-shi")
                .get("torch_cpu_train_fps"))
    line = {
        "metric": "VPSuite.train end-to-end frames/sec (MMF device backend)",
        "value": round(value, 2), "unit": "frames/sec",
        "vs_baseline": round(value / baseline, 2) if baseline else 0.0,
        "baseline": "PyTorch reference convlstm-shi full train loop on host CPU",
        "detail": {"epoch_fps": [round(f, 1) for f in fps],
                   "steps_per_epoch": steps, "batch": batch, "img": img},
    }
    emit(json.dumps(line), flush=True)
    return line


def probe_device(platform=None, timeout_s=360, model_id=None):
    r"""Fails fast (one JSON error line + exit 1) when the accelerator is
    unreachable, instead of hanging the driver forever: the axon TPU tunnel
    can go down, and jax calls then block indefinitely (no RPC deadline).
    Runs a tiny dot in a daemon thread and waits ``timeout_s`` — which must
    exceed the remote compile server's worst case (~4 min for a cold cache,
    CLAUDE.md), so the persistent compilation cache is enabled first and the
    timeout leaves headroom above it."""
    import threading
    done = threading.Event()
    err = []

    def _try():
        try:
            import jax
            if platform:
                jax.config.update("jax_platforms", platform)
            from vp_suite_tpu.utils.utils import enable_compilation_cache
            enable_compilation_cache()
            import jax.numpy as jnp
            x = jnp.ones((128, 128))
            float(np.asarray(jnp.dot(x, x).sum()))
            done.set()
        except Exception as e:  # noqa: BLE001 - report any backend failure
            err.append(repr(e))
            done.set()

    t = threading.Thread(target=_try, daemon=True)
    t.start()
    if not done.wait(timeout_s) or err:
        reason = err[0] if err else f"device unresponsive after {timeout_s}s"
        metrics = dict(ALL_CONFIGS)
        metric = metrics.get(model_id or "convlstm-shi",
                             f"{model_id} train frames/sec/chip")
        print(json.dumps({
            "metric": metric,
            "value": 0, "unit": "frames/sec", "vs_baseline": 0,
            "error": f"accelerator probe failed: {reason}",
        }), flush=True)
        sys.exit(1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true", help="tiny shapes, quick check")
    parser.add_argument("--e2e", action="store_true",
                        help="measure end-to-end VPSuite.train throughput "
                             "(facade + device-resident MMF synthesis) "
                             "instead of the isolated jitted step")
    parser.add_argument("--all", action="store_true",
                        help="benchmark all five BASELINE.json configs "
                             "(one JSON line per config)")
    parser.add_argument("--platform", default=None, help="force jax platform (cpu/tpu)")
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--steps", type=int, default=10,
                        help="timing-loop length N (marginal cost over "
                             "T(2N)-T(N); larger = tighter estimate)")
    parser.add_argument("--refresh-baseline", action="store_true")
    parser.add_argument("--no-remat", action="store_true",
                        help="disable scan-body rematerialization")
    parser.add_argument("--pallas", action="store_true",
                        help="use the fused Pallas gate kernel")
    parser.add_argument("--unroll", type=int, default=None,
                        help="lax.scan unroll factor for ConvLSTM cells "
                             "(default: the model's auto policy)")
    parser.add_argument("--model", default=None,
                        help="model registry id (BASELINE.json configs: "
                             "convlstm-shi on MM, predrnn-pp/unet-3d on KTH shapes, "
                             "phy on BAIR shapes). Default: the full five-config "
                             "sweep, printed as ONE north-star line with the other "
                             "configs embedded + a BENCH_ALL.jsonl sidecar")
    args = parser.parse_args()
    probe_device(args.platform, model_id=args.model)

    if args.e2e:
        measure_e2e(args)
        return

    if args.all:
        run_all(args)
        return

    if args.model is None and not args.smoke and not args.pallas \
            and args.unroll is None:
        # Driver default: benchmark ALL five BASELINE.json configs so every
        # config is regression-tracked, but print exactly ONE JSON line (the
        # north-star ConvLSTM config) with the other configs' numbers embedded
        # in detail.all_configs; the full per-config lines also land in the
        # BENCH_ALL.jsonl sidecar.
        lines = run_all(args, emit=lambda *a, **k: None)
        # the facade end-to-end number is part of the default sweep so the
        # user-visible VPSuite.train throughput is regression-tracked, not
        # just the isolated jitted step (VERDICT r3 weak #6)
        try:
            e2e_line = measure_e2e(args, emit=lambda *a, **k: None)
        except Exception as exc:  # never lose the isolated numbers over e2e
            e2e_line = {"metric": "VPSuite.train end-to-end frames/sec "
                                  "(MMF device backend)",
                        "value": 0, "unit": "frames/sec", "vs_baseline": 0.0,
                        "detail": {"error": repr(exc)}}
        with open(BENCH_ALL_SIDECAR, "w") as f:
            for line in lines + [e2e_line]:
                f.write(json.dumps(line) + "\n")
        north = next(l for l in lines
                     if l["detail"]["model_id"] == "convlstm-shi")
        others = [{k: l[k] for k in ("metric", "value", "vs_baseline")}
                  | {"mfu": l["detail"].get("mfu"),
                     "step_ms": l["detail"].get("train_step_ms")
                     or l["detail"].get("infer_step_ms")}
                  for l in lines if l is not north]
        others.append({k: e2e_line[k]
                       for k in ("metric", "value", "vs_baseline")})
        north = {**north, "detail": {**north["detail"], "all_configs": others}}
        print(json.dumps(north))
        return

    model_id = args.model or "convlstm-shi"
    if args.smoke:
        ours = measure_ours(img=16, ctx=2, pred=2, batch=4, steps=3,
                            compute_dtype=args.dtype, platform=args.platform,
                            remat=not args.no_remat, use_pallas=args.pallas,
                            model_id=model_id, unroll=args.unroll)
        baseline = {"torch_cpu_train_fps": None, "note": "smoke run, no baseline"}
    else:
        ours = measure_ours(compute_dtype=args.dtype, platform=args.platform,
                            steps=args.steps, remat=not args.no_remat,
                            use_pallas=args.pallas, model_id=model_id,
                            unroll=args.unroll)
        baseline = get_torch_baseline(refresh=args.refresh_baseline,
                                      model_id=model_id)

    base_fps = baseline.get("torch_cpu_train_fps")
    vs_baseline = (ours["train_fps"] / base_fps) \
        if (base_fps and ours["train_fps"]) else 0.0
    names = {"convlstm-shi": "ConvLSTM-Shi MovingMNIST",
             "predrnn-pp": "PredRNN++ KTH-shaped", "phy": "PhyDNet BAIR-shaped",
             "unet-3d": "UNet-3D KTH-shaped"}
    result = {
        "metric": f"{names.get(model_id, model_id)} 5ctx->10pred train frames/sec/chip",
        "value": round(ours["train_fps"], 2),
        "unit": "frames/sec",
        "vs_baseline": round(vs_baseline, 2),
        "baseline": f"PyTorch reference {model_id} on host CPU (no GPU available)",
        "detail": {**ours, "baseline_fps": base_fps},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
