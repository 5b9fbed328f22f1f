r"""Hand-written VJP for the scanned ConvLSTM recurrence.

Why this exists: profiling the flagship EF-ConvLSTM train step
(``scripts/profile_step.py``) showed ~7 ms/step of pure buffer management
around ``jax.checkpoint``-in-``lax.scan`` — XLA zero-initializes the stacked
gate-save residual buffers ([t, b, sh, sw, 4f], ~0.6 GB), copies them between
the forward and backward loops, and materializes ``reverse`` ops — on top of
the dynamic-update-slice writes that are the saves themselves. None of that
is inherent: the gate pre-activations are *already* computed each step, and
the backward pass is itself a scan.

This module writes the recurrence VJP by hand:

- the forward ``lax.scan`` emits ``(h, c, gates)`` as stacked outputs (ys) —
  the ``h`` sequence doubles as the layer output, so the only *extra*
  residual vs. inference is ``gates`` + ``c``;
- the backward is an explicit ``lax.scan(..., reverse=True)`` whose carry
  accumulates the weight/peephole gradients (f32) and whose per-step body is
  the closed-form gate backward + the two conv VJPs (both MXU matmuls).

Numerics match ``jax.grad`` of the plain scan to float tolerance (unit
tests: ``tests/test_scan_vjp.py``). Reference semantics being accelerated:
``vp_suite/model_blocks/conv_lstm_hzzone.py:52-69``.

Layout: time-major [t, b, sh, sw, ...] throughout (the EF stack's native
layout). Weights: ``h_kernel [kh, kw, f, 4f]``, peepholes ``[sh, sw, f]``.
"""
import functools

import jax
import jax.numpy as jnp
from jax import lax

from vp_suite_tpu.model_blocks._functional import conv2d


def _gate_fwd(gates, c, wci, wcf, wco):
    gi, gf, gc, go = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(gi + wci * c)
    f = jax.nn.sigmoid(gf + wcf * c)
    c_new = f * c + i * jnp.tanh(gc)
    o = jax.nn.sigmoid(go + wco * c_new)
    return o * jnp.tanh(c_new), c_new


def _gate_bwd(gates, c, wci, wcf, wco, dh, dc_out):
    r"""Closed-form backward of :func:`_gate_fwd` (recomputes activations
    from the saved pre-activations — cheap VPU work, no extra residuals).
    Runs in the inputs' dtype, exactly like autodiff of the bf16 forward
    would — an all-f32 variant was measured 25 ms/step slower on the
    flagship bench (double VPU work + convert traffic)."""
    gi, gf, gc, go = jnp.split(gates, 4, axis=-1)
    one = jnp.ones((), gates.dtype)

    i = jax.nn.sigmoid(gi + wci * c)
    f = jax.nn.sigmoid(gf + wcf * c)
    g = jnp.tanh(gc)
    c_new = f * c + i * g
    o = jax.nn.sigmoid(go + wco * c_new)
    t2 = jnp.tanh(c_new)

    dzo = dh * t2 * o * (one - o)
    dc2 = dc_out + dh * o * (one - t2 * t2) + dzo * wco
    dzi = dc2 * g * i * (one - i)
    dzf = dc2 * c * f * (one - f)
    dgc = dc2 * i * (one - g * g)
    dgates = jnp.concatenate([dzi, dzf, dgc, dzo], axis=-1)
    dc_in = dc2 * f + dzi * wci + dzf * wcf
    # per-step peephole grad contributions (summed over batch)
    dwci = jnp.sum(dzi * c, axis=0)
    dwcf = jnp.sum(dzf * c, axis=0)
    dwco = jnp.sum(dzo * c_new, axis=0)
    return dgates, dc_in, dwci, dwcf, dwco, c_new


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def convlstm_scan(i2h_t, bias, h0, c0, h_kernel, wci, wcf, wco,
                  stride, padding, seq_len):
    r"""Runs the peephole-ConvLSTM recurrence over ``seq_len`` steps.

    Args:
        i2h_t: [t, b, sh, sw, 4f] hoisted input-half pre-activations, or
            None (decode mode — ``bias`` rides the hidden conv instead).
        bias: [4f] (used only when ``i2h_t`` is None; pass zeros otherwise).
        h0, c0: [b, sh, sw, f] initial state.
        h_kernel: [kh, kw, f, 4f]; wci/wcf/wco: [sh, sw, f].
        stride, padding, seq_len: static conv/trip-count config.

    Returns: (outputs [t, b, sh, sw, f], (h_last, c_last)).
    """
    decode = i2h_t is None

    def step(carry, i2h_step):
        h, c = carry
        conv_h = conv2d(h, h_kernel, bias if decode else None, stride, padding)
        gates = conv_h if decode else i2h_step + conv_h
        h_new, c_new = _gate_fwd(gates, c, wci, wcf, wco)
        return (h_new, c_new), h_new

    (h_last, c_last), outputs = lax.scan(step, (h0, c0), i2h_t, length=seq_len)
    return outputs, (h_last, c_last)


def _scan_fwd(i2h_t, bias, h0, c0, h_kernel, wci, wcf, wco,
              stride, padding, seq_len):
    decode = i2h_t is None

    def step(carry, i2h_step):
        h, c = carry
        conv_h = conv2d(h, h_kernel, bias if decode else None, stride, padding)
        gates = conv_h if decode else i2h_step + conv_h
        h_new, c_new = _gate_fwd(gates, c, wci, wcf, wco)
        # ys: h_new is the layer output anyway; gates + c_new are the only
        # true extra residuals (c_new avoids recomputing the c chain in bwd)
        return (h_new, c_new), (h_new, c_new, gates)

    (h_last, c_last), (outputs, c_seq, gates_seq) = lax.scan(
        step, (h0, c0), i2h_t, length=seq_len)
    # decode-mode flag rides the PYTREE STRUCTURE (None vs scalar) so the
    # backward can branch on it statically under jit
    decode_marker = None if decode else jnp.zeros((), jnp.int8)
    res = (outputs, c_seq, gates_seq, h0, c0, h_kernel, wci, wcf, wco,
           bias, decode_marker)
    return (outputs, (h_last, c_last)), res


def _scan_bwd(stride, padding, seq_len, res, cotangents):
    (outputs, c_seq, gates_seq, h0, c0, h_kernel, wci, wcf, wco,
     bias, decode_marker) = res
    decode = decode_marker is None
    d_outputs, (dh_last, dc_last) = cotangents
    f32 = jnp.float32

    # previous-step states, aligned per step t: h_{t-1}, c_{t-1}
    h_prev_seq = jnp.concatenate([h0[None], outputs[:-1]], axis=0)
    c_prev_seq = jnp.concatenate([c0[None], c_seq[:-1]], axis=0)

    conv_f = lambda h, k: conv2d(h, k, None, stride, padding)

    dt = outputs.dtype

    def bwd_step(carry, xs):
        dh_next, dc_next, d_hk, d_wci, d_wcf, d_wco = carry
        h_prev, c_prev, gates, d_out = xs
        dh = dh_next + d_out
        dgates, dc_in, dwci_s, dwcf_s, dwco_s, _ = _gate_bwd(
            gates, c_prev, wci, wcf, wco, dh, dc_next)
        # conv VJPs (both MXU): d wrt the input h_prev and the kernel
        _, conv_vjp = jax.vjp(conv_f, h_prev, h_kernel)
        dh_prev, d_hk_step = conv_vjp(dgates)
        carry = (dh_prev, dc_in, d_hk + d_hk_step,
                 d_wci + dwci_s, d_wcf + dwcf_s, d_wco + dwco_s)
        return carry, dgates

    # d_hk accumulates in the KERNEL's dtype (f32 param → f32 accumulation,
    # exactly what autodiff of the closed-over cast kernel does: the conv
    # grad is computed in bf16, converted once per step); peephole grads
    # accumulate in the activation dtype like their autodiff counterpart
    carry0 = (dh_last.astype(dt), dc_last.astype(dt),
              jnp.zeros(h_kernel.shape, h_kernel.dtype),
              jnp.zeros(wci.shape, dt), jnp.zeros(wcf.shape, dt),
              jnp.zeros(wco.shape, dt))
    (dh0, dc0, d_hk, d_wci, d_wcf, d_wco), dgates_seq = lax.scan(
        bwd_step, carry0, (h_prev_seq, c_prev_seq, gates_seq, d_outputs),
        reverse=True)

    if decode:
        d_i2h = None
        d_bias = jnp.sum(dgates_seq.astype(f32), axis=(0, 1, 2, 3))
    else:
        d_i2h = dgates_seq
        d_bias = jnp.zeros((4 * wci.shape[-1],), f32)
    # cotangent dtypes must match the primal avals exactly
    return (d_i2h, d_bias.astype(bias.dtype), dh0.astype(h0.dtype),
            dc0.astype(c0.dtype), d_hk.astype(h_kernel.dtype),
            d_wci.astype(wci.dtype), d_wcf.astype(wcf.dtype),
            d_wco.astype(wco.dtype))


convlstm_scan.defvjp(_scan_fwd, _scan_bwd)
