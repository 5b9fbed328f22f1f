r"""Spatio-Temporal LSTM cells (PredRNN-V2) — TPU-native.

Capability parity with the reference cells
(``vp_suite/model_blocks/predrnn.py:7-169``): 7/4/3-way gate convolutions on
x/h/m, dual memories (c temporal, m spatial), optional per-position LayerNorm,
and the action-conditional variant which modulates the h-gates.

Cells are exposed as *param factories*: ``make_st_lstm_cell(module, ...)``
creates the parameters on the calling flax module and returns a pure step
closure usable directly inside a ``jax.lax.scan`` body (the PredRNN model
scans layers x time with chip-resident carries).

Parameter naming mirrors the reference state_dict structure so torch
checkpoints convert mechanically (conv_x/conv_h/conv_m/conv_o/conv_last).
"""
import jax
import jax.numpy as jnp

from vp_suite_tpu.model_blocks._functional import (
    conv2d, layer_norm_chw, make_conv_params)


def make_st_lstm_cell(module, name, in_channel, num_hidden, height, width,
                      filter_size, stride, layer_norm, action_conditional=False):
    r"""Creates an (AC-)ST-LSTM cell's params on ``module``; returns a step fn.

    Non-AC step: ``step(x, h, c, m) -> (h_new, c_new, m_new, delta_c, delta_m)``
    AC step:     ``step(x, h, c, m, a) -> ...`` (reference: predrnn.py:142-169)

    The AC variant uses biased convs; the plain variant uses bias-free convs
    (parity: reference predrnn.py:26 vs :105).
    """
    pad = filter_size // 2
    use_bias = action_conditional
    forget_bias = 1.0

    cx_k, cx_b = make_conv_params(module, f"{name}_conv_x", in_channel, num_hidden * 7,
                                  filter_size, use_bias=use_bias)
    ch_k, ch_b = make_conv_params(module, f"{name}_conv_h", num_hidden, num_hidden * 4,
                                  filter_size, use_bias=use_bias)
    ca_k, ca_b = (None, None)
    if action_conditional:
        ca_k, ca_b = make_conv_params(module, f"{name}_conv_a", num_hidden, num_hidden * 4,
                                      filter_size, use_bias=use_bias)
    cm_k, cm_b = make_conv_params(module, f"{name}_conv_m", num_hidden, num_hidden * 3,
                                  filter_size, use_bias=use_bias)
    co_k, co_b = make_conv_params(module, f"{name}_conv_o", num_hidden * 2, num_hidden,
                                  filter_size, use_bias=use_bias)
    cl_k, cl_b = make_conv_params(module, f"{name}_conv_last", num_hidden * 2, num_hidden,
                                  1, use_bias=use_bias)

    ln_params = {}
    if layer_norm:
        import flax.linen as nn
        for ln_name, ch in [("ln_x", num_hidden * 7), ("ln_h", num_hidden * 4),
                            ("ln_a", num_hidden * 4) if action_conditional else (None, 0),
                            ("ln_m", num_hidden * 3), ("ln_o", num_hidden)]:
            if ln_name is None:
                continue
            scale = module.param(f"{name}_{ln_name}_scale", nn.initializers.ones,
                                 (height, width, ch))
            bias = module.param(f"{name}_{ln_name}_bias", nn.initializers.zeros,
                                (height, width, ch))
            ln_params[ln_name] = (scale, bias)

    def _maybe_ln(x, key):
        if layer_norm:
            s, b = ln_params[key]
            return layer_norm_chw(x, s, b)
        return x

    def step(x_t, h_t, c_t, m_t, a_t=None):
        from jax.ad_checkpoint import checkpoint_name
        # named for selective remat: saving the gate pre-activations lets the
        # backward pass skip recomputing the three big gate convolutions
        x_concat = checkpoint_name(
            _maybe_ln(conv2d(x_t, cx_k, cx_b, stride, pad), "ln_x"), "st_gates")
        h_concat = _maybe_ln(conv2d(h_t, ch_k, ch_b, stride, pad), "ln_h")
        m_concat = _maybe_ln(conv2d(m_t, cm_k, cm_b, stride, pad), "ln_m")
        h_concat = checkpoint_name(h_concat, "st_gates")
        m_concat = checkpoint_name(m_concat, "st_gates")
        if action_conditional:
            a_concat = _maybe_ln(conv2d(a_t, ca_k, ca_b, stride, pad), "ln_a")
            h_concat = h_concat * a_concat

        i_x, f_x, g_x, i_xp, f_xp, g_xp, o_x = jnp.split(x_concat, 7, axis=-1)
        i_h, f_h, g_h, o_h = jnp.split(h_concat, 4, axis=-1)
        i_m, f_m, g_m = jnp.split(m_concat, 3, axis=-1)

        i_t = jax.nn.sigmoid(i_x + i_h)
        f_t = jax.nn.sigmoid(f_x + f_h + forget_bias)
        g_t = jnp.tanh(g_x + g_h)
        delta_c = i_t * g_t
        c_new = f_t * c_t + delta_c

        i_tp = jax.nn.sigmoid(i_xp + i_m)
        f_tp = jax.nn.sigmoid(f_xp + f_m + forget_bias)
        g_tp = jnp.tanh(g_xp + g_m)
        delta_m = i_tp * g_tp
        m_new = f_tp * m_t + delta_m

        mem = jnp.concatenate([c_new, m_new], axis=-1)
        o_t = jax.nn.sigmoid(o_x + o_h + _maybe_ln(conv2d(mem, co_k, co_b, stride, pad), "ln_o"))
        h_new = o_t * jnp.tanh(conv2d(mem, cl_k, cl_b, 1, 0))
        return h_new, c_new, m_new, delta_c, delta_m

    return step
