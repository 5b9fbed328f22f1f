r"""Measure the fused whole-scan ConvLSTM kernel vs the XLA scan (forward).

The VERDICT-r3 experiment: does keeping the (h, c) carry in VMEM across all
timesteps (ops/pallas_convlstm.py) beat XLA's per-step conv + fused-epilogue
structure? Run on TPU at the flagship EF-ConvLSTM layer shapes. Timing uses
the marginal-cost host-fetch protocol (bench.py): the axon backend's
block_until_ready does not wait.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fused_convlstm.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from vp_suite_tpu.utils.utils import enable_compilation_cache

enable_compilation_cache()

# flagship EF-ConvLSTM recurrent layers (encoder side; forecaster mirrors):
# (state_h, state_w, enc, seq_len)
LAYERS = [(64, 64, 64, 15), (32, 32, 96, 15), (16, 16, 96, 15)]
BATCH = 32
DT = jnp.bfloat16


def _xla_scan(i2h_t, h0, c0, h_kernel, bias, wci, wcf, wco, seq_len):
    from vp_suite_tpu.model_blocks._functional import conv2d

    def step(carry, i2h):
        h, c = carry
        gates = conv2d(h, h_kernel, bias, 1, 1)
        if i2h is not None:
            gates = gates + i2h
        gi, gf, gc, go = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(gi + wci * c)
        f = jax.nn.sigmoid(gf + wcf * c)
        c_new = f * c + i * jnp.tanh(gc)
        o = jax.nn.sigmoid(go + wco * c_new)
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (h, c), seq = jax.lax.scan(step, (h0, c0), i2h_t, length=seq_len)
    return seq, (h, c)


def timeit(fn, *args, reps=20, pairs=5):
    out = fn(*args)
    sync = out[0]
    float(np.asarray(sync).reshape(-1)[0])

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(np.asarray(out[0]).reshape(-1)[0])
        return time.perf_counter() - t0

    # One (T(2N)-T(N)) pair is fragile on the 1-core host: a single load
    # spike during either leg can push the marginal estimate negative
    # (observed in /tmp/r4_tpu/fused_convlstm_fixed2.txt). Take the median
    # over several pairs instead.
    ests = []
    for _ in range(pairs):
        t_n = run(reps)
        t_2n = run(2 * reps)
        ests.append((t_2n - t_n) / reps * 1000)  # ms
    return float(np.median(ests))


def main():
    from vp_suite_tpu.ops.pallas_convlstm import convlstm_scan_fused

    print("device:", jax.devices()[0])
    for mode in ("decode", "input"):
        for sh, sw, enc, t in LAYERS:
            rng = np.random.RandomState(0)
            h0 = jnp.zeros((BATCH, sh, sw, enc), DT)
            c0 = jnp.zeros_like(h0)
            hk = jnp.asarray(rng.randn(3, 3, enc, 4 * enc) * 0.1, DT)
            bias = jnp.asarray(rng.randn(4 * enc) * 0.1, jnp.float32)
            peep = [jnp.asarray(rng.randn(sh, sw, enc) * 0.1, DT)
                    for _ in range(3)]
            i2h = None if mode == "decode" else jnp.asarray(
                rng.randn(t, BATCH, sh, sw, 4 * enc) * 0.1, DT)

            fused = jax.jit(lambda i2h_, h0_, c0_: convlstm_scan_fused(
                i2h_, h0_, c0_, hk, bias, *peep, seq_len=t))
            xla = jax.jit(lambda i2h_, h0_, c0_: _xla_scan(
                i2h_, h0_, c0_, hk, bias, *peep, seq_len=t))

            ms_f = timeit(lambda a, b, c: fused(a, b, c), i2h, h0, c0)
            ms_x = timeit(lambda a, b, c: xla(a, b, c), i2h, h0, c0)
            # numerics check at the same precision
            sf, _ = fused(i2h, h0, c0)
            sx, _ = xla(i2h, h0, c0)
            err = float(jnp.max(jnp.abs(sf.astype(jnp.float32)
                                        - sx.astype(jnp.float32))))
            print(f"{mode} {sh}x{sw} enc={enc} T={t}: fused {ms_f:.2f} ms | "
                  f"xla {ms_x:.2f} ms | speedup {ms_x / ms_f:.2f}x | "
                  f"max_err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
