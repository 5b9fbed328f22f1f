r"""UNet-3D roofline: quantify the step-time floor the 50 ms bench sits on.

Round-4 VERDICT #5 asks for the actual floor behind UNet-3D's 3.5% MFU:
the trace shows 1,414 micro-fusions (avg 16 us) + 5,250 `copy-done` DMAs
per step and MXU < 1% — an op-count/DMA diagnosis, not a bound. This script
computes the bound from first principles on the real chip:

1. **HBM floor** — ENTRY-computation (thunk-level) traffic / measured
   achievable HBM bandwidth. Each top-level instruction of the optimized
   HLO is one executed thunk whose operands/output are real HBM buffers;
   instructions *inside* fusions stay in registers/VMEM. (The first cut
   used `cost_analysis()['bytes accessed']`, which counts fused
   instructions too and reported 93.5 GB — more than the measured step
   could physically move at HBM speed, i.e. ~3x over.) The AR rollout is
   an unrolled Python loop (no scan), so every thunk appears exactly once
   — no scan under-reporting (CLAUDE.md caveat N/A).
2. **Dispatch floor** — the per-op issue overhead times the executed thunk
   count, calibrated on-chip: a chain of N data-dependent tiny convs
   (convolutions never fuse into each other) timed at N and 2N, marginal
   cost = per-op turnaround with RPC/dispatch constants cancelled.
3. **Achievable HBM BW** — a big dependent-copy chain (reads+writes 2x its
   bytes) timed the same marginal way.

Floor = max(HBM floor, dispatch floor) .. their sum (the two serialize when
ops are too small to overlap DMA with issue). The verdict line compares the
measured step against that window.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/unet3d_roofline.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def _timed(make, n, reps=3):
    r"""Wall seconds for one n-iteration program execution, synced by a host
    fetch. ``make(n)`` returns a zero-arg callable whose jit program is
    ALREADY compiled and warmed — compile time (minutes via the remote
    compile server) must never sit inside the timed region. Median of reps."""
    call = make(n)
    _sync(call())  # warm (cache hits, allocs)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _sync(call())
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def _marginal(make, n):
    r"""(T(2n) - T(n)) / n: per-iteration cost with constants cancelled."""
    t1 = _timed(make, n)
    t2 = _timed(make, 2 * n)
    return (t2 - t1) / n


_BYTES = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
          "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
          "s64": 8, "u64": 8, "c64": 8}
_SHAPE_RE = None


def _shape_bytes(shape_str):
    r"""Total bytes of an HLO shape string: ``bf16[32,64,64]{...}`` or a
    tuple ``(f32[..]{..}, bf16[..]{..})``."""
    global _SHAPE_RE
    import re
    if _SHAPE_RE is None:
        _SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _BYTES:
            continue  # token[] etc — no HBM footprint
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dtype]
    return total


# entry ops that move no HBM bytes of their own
_FREE_OPS = ("parameter(", "constant(", "tuple(", "get-tuple-element(",
             "bitcast(", "after-all(", "iota(")


def entry_level_stats(hlo_text):
    r"""Thunk-level traffic from the post-optimization HLO: each ENTRY
    instruction is one executed thunk whose operands/output are real HBM
    buffers (instructions *inside* fusions stay in registers/VMEM and must
    NOT be counted — ``cost_analysis()['bytes accessed']`` counts them and
    over-reports ~3x). Returns (thunk_count, write_bytes, read_bytes)."""
    import re
    lines = []
    in_entry = False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if line.startswith("}"):
                break
            lines.append(line.strip())
    defn = re.compile(r"^(%?[\w.-]+) = ((?:\([^)]*\)|\S+)) (\w+[\w-]*)\((.*)")
    sizes = {}
    parsed = []
    for ln in lines:
        m = defn.match(ln)
        if not m:
            continue
        name, shape, op, rest = m.groups()
        sizes[name] = _shape_bytes(shape)
        parsed.append((name, shape, op, rest, ln))
    thunks = writes = reads = 0
    opname = re.compile(r"%[\w.-]+")
    for name, shape, op, rest, ln in parsed:
        if any(f in ln for f in _FREE_OPS) and op in (
                "parameter", "constant", "tuple", "get-tuple-element",
                "bitcast", "after-all", "iota"):
            continue
        thunks += 1
        writes += sizes[name]
        # operands: %refs before any attribute like calls=/kind= — take refs
        # in the argument parens only (up to the first '), ')
        argpart = rest.split("), ")[0]
        for ref in opname.findall(argpart):
            reads += sizes.get(ref, 0)
    return thunks, writes, reads


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--calib", nargs=2, type=float, metavar=("PER_OP_US", "HBM_GBPS"),
                        help="reuse calibration numbers (skip the ~8 min on-chip calibration)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from vp_suite_tpu.utils.utils import enable_compilation_cache
    enable_compilation_cache()

    if args.calib:
        per_op_us, hbm_bw = args.calib[0], args.calib[1] * 1e9
        print(f"reusing calibration: {per_op_us:.2f} us/op, "
              f"{hbm_bw / 1e9:.0f} GB/s", flush=True)
        return analyze(per_op_us, hbm_bw)

    # --- calibration 1: per-op dispatch/issue overhead ------------------
    # a chain of data-dependent 1x1 convs on a tiny [8, 8, 8, 8] activation:
    # each conv is its own HLO op (convs don't fuse into each other), bytes
    # are negligible (4 KB), so the marginal cost IS the per-op overhead.
    w = jnp.eye(8, dtype=jnp.float32).reshape(1, 1, 8, 8) * 0.999

    def conv_chain(n):
        @jax.jit
        def run(x):
            for _ in range(n):
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return x[0, 0, 0]
        x = jnp.ones((8, 8, 8, 8), jnp.float32)
        _sync(run(x))  # compile OUTSIDE any timed region
        return lambda: run(x)

    per_op_us = _marginal(conv_chain, 400) * 1e6
    print(f"per-op issue overhead: {per_op_us:.2f} us", flush=True)

    # --- calibration 2: achievable HBM bandwidth ------------------------
    # dependent elementwise passes over a 256 MB tensor: each pass reads +
    # writes the buffer (2x bytes). optimization_barrier between passes stops
    # XLA fusing the chain into one kernel (which would touch HBM only once).
    big = jnp.ones((64, 1024, 1024), jnp.float32)  # 256 MB
    nbytes = big.size * 4

    def bw_chain(n):
        @jax.jit
        def run(x):
            for _ in range(n):
                x = jax.lax.optimization_barrier(x * 1.0000001)
            return x[0, 0, 0]
        _sync(run(big))  # compile OUTSIDE any timed region
        return lambda: run(big)

    per_pass_s = _marginal(bw_chain, 32)
    hbm_bw = 2 * nbytes / per_pass_s
    print(f"achievable HBM BW: {hbm_bw / 1e9:.0f} GB/s", flush=True)
    analyze(per_op_us, hbm_bw)


def analyze(per_op_us, hbm_bw):
    import jax
    import jax.numpy as jnp

    # --- the model step: bytes + op count + measured time ---------------
    from bench import measure_ours
    import optax
    from vp_suite_tpu.models import MODEL_CLASSES
    from vp_suite_tpu.training.train_state import create_train_state
    from vp_suite_tpu.training.loop import make_train_step
    from vp_suite_tpu.measure.loss_provider import PredictionLossProvider

    img, ctx, pred, batch = 64, 5, 10, 32
    model = MODEL_CLASSES["unet-3d"](img_shape=(3, img, img), action_size=0,
                                     tensor_value_range=(0.0, 1.0),
                                     compute_dtype=jnp.bfloat16, remat=True,
                                     temporal_dim=3)
    run_config = {"context_frames": ctx, "pred_frames": pred,
                  "use_actions": False}
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               context_frames=ctx, pred_frames=pred)
    loss_provider = PredictionLossProvider(
        {"losses_and_scales": {"mse": 1.0}, "img_c": 3, "device": None})
    train_step = make_train_step(model, run_config, optimizer, loss_provider,
                                 donate=False, use_jit=False)
    rng = np.random.RandomState(0)
    batch_dev = {
        "frames": jnp.asarray(rng.rand(batch, ctx + pred, img, img, 3),
                              jnp.float32),
        "actions": jnp.zeros((batch, ctx + pred, 1), jnp.float32),
    }
    epoch = jnp.asarray(0.0)
    compiled = jax.jit(train_step).lower(state, batch_dev, epoch).compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", 0.0))
    thunks, write_b, read_b = entry_level_stats(compiled.as_text())
    traffic = write_b + read_b
    print(f"entry-level: {thunks} thunks, {write_b / 1e9:.2f} GB written + "
          f"{read_b / 1e9:.2f} GB read = {traffic / 1e9:.2f} GB HBM traffic; "
          f"{flops / 1e12:.2f} TFLOP", flush=True)

    measured = measure_ours(model_id="unet-3d", steps=20)
    step_ms = measured["train_step_ms"]

    hbm_floor_ms = traffic / hbm_bw * 1e3
    dispatch_floor_ms = thunks * per_op_us / 1e3
    floor_lo = max(hbm_floor_ms, dispatch_floor_ms)
    floor_hi = hbm_floor_ms + dispatch_floor_ms
    out = {
        "model": "unet-3d",
        "measured_step_ms": round(step_ms, 2),
        "per_op_overhead_us": round(per_op_us, 2),
        "achievable_hbm_gbps": round(hbm_bw / 1e9, 1),
        "entry_thunks": thunks,
        "hbm_traffic_gb": round(traffic / 1e9, 3),
        "hbm_floor_ms": round(hbm_floor_ms, 2),
        "dispatch_floor_ms": round(dispatch_floor_ms, 2),
        "floor_window_ms": [round(floor_lo, 2), round(floor_hi, 2)],
        "x_of_floor": round(step_ms / floor_lo, 2),
    }
    print(json.dumps(out, indent=2))
    Path("/tmp/unet3d_roofline.json").write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
