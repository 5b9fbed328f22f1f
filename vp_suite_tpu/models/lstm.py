r"""Encoder-LSTM-decoder video prediction model.

Capability parity with ``vp_suite/models/lstm.py:8-114``: conv encoder (3
strided convs) → linear bottleneck (1024) → stacked LSTM cells → linear +
deconv decoder with final resize; optional action inflation concatenated to
the latent.

Documented deviations from the reference (whose own ``MATCHES_REFERENCE`` is
"Not Yet"): the reference keeps its LSTM cells in a plain Python list (never
registered/trained, ``lstm.py:46``) and its warm-up loop discards the updated
hidden states while feeding every layer the same input (``lstm.py:94-95``).
This implementation uses properly stacked, trained LSTM cells with chained
layer inputs.

TPU-first structure: context frames are encoded as ONE batched conv pass, the
LSTM warm-up is a ``lax.scan`` over the latent sequence, and the
autoregressive decode is a ``lax.scan`` whose carry holds the cell states +
last latent (the decoder/encoder conv params are closed over as arrays).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from vp_suite_tpu.base.base_model import VPModel
from vp_suite_tpu.model_blocks._functional import conv2d, conv_transpose2d, make_conv_params
from vp_suite_tpu.nn.layers import torch_kernel_init, torch_bias_init
from vp_suite_tpu.ops.image import resize_bilinear
from vp_suite_tpu.utils.models import conv_output_shape


def _lstm_cell_step(x, h, c, w_ih, b_ih, w_hh, b_hh):
    r"""torch nn.LSTMCell math (gate order i, f, g, o). Params cast to the
    activation dtype (mixed-precision scan carries stay uniform)."""
    w_ih, b_ih = w_ih.astype(x.dtype), b_ih.astype(x.dtype)
    w_hh, b_hh = w_hh.astype(x.dtype), b_hh.astype(x.dtype)
    gates = x @ w_ih + b_ih + h @ w_hh + b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


class LSTM(VPModel):
    NAME = "NonConvLSTM"
    MATCHES_REFERENCE = "No (reference implementation is broken; see docstring)"
    CAN_HANDLE_ACTIONS = True

    bottleneck_dim: int = 1024
    lstm_hidden_dim: int = 1024
    lstm_num_layers: int = 3

    def _encoded_shape(self):
        h, w = self.img_h, self.img_w
        h, w = conv_output_shape((h, w), 7, 2, 3)
        h, w = conv_output_shape((h, w), 3, 2, 1)
        h, w = conv_output_shape((h, w), 3, 2, 1)
        return (h, w, 256)

    @nn.compact
    def __call__(self, x, pred_frames: int = 1, actions=None, train: bool = False, **kwargs):
        b, t_in = x.shape[:2]
        c, ih, iw = self.img_shape
        if x.shape[2:] != (ih, iw, c):
            raise ValueError(f"input image does not match specified size "
                             f"(input: {x.shape[2:]}, required (h,w,c): {(ih, iw, c)})")
        eh, ew, ec = self._encoded_shape()
        enc_numel = eh * ew * ec

        # --- params ---
        e1_k, e1_b = make_conv_params(self, "enc1", c, 64, 7)
        e2_k, e2_b = make_conv_params(self, "enc2", 64, 128, 3)
        e3_k, e3_b = make_conv_params(self, "enc3", 128, 256, 3)
        tl_k = self.param("to_linear_kernel", torch_kernel_init, (enc_numel, self.bottleneck_dim))
        tl_b = self.param("to_linear_bias", torch_bias_init(enc_numel), (self.bottleneck_dim,))
        bottleneck_dim = self.bottleneck_dim
        if self.action_conditional:
            inflated_action_size = self.bottleneck_dim // 10
            bottleneck_dim += inflated_action_size
            ai_k = self.param("action_inflate_kernel", torch_kernel_init,
                              (self.action_size, inflated_action_size))
            ai_b = self.param("action_inflate_bias", torch_bias_init(self.action_size),
                              (inflated_action_size,))
        cells = []
        in_dim = bottleneck_dim
        for li in range(self.lstm_num_layers):
            w_ih = self.param(f"lstm{li}_w_ih", torch_kernel_init,
                              (in_dim, 4 * self.lstm_hidden_dim))
            b_ih = self.param(f"lstm{li}_b_ih", torch_bias_init(self.lstm_hidden_dim),
                              (4 * self.lstm_hidden_dim,))
            w_hh = self.param(f"lstm{li}_w_hh", torch_kernel_init,
                              (self.lstm_hidden_dim, 4 * self.lstm_hidden_dim))
            b_hh = self.param(f"lstm{li}_b_hh", torch_bias_init(self.lstm_hidden_dim),
                              (4 * self.lstm_hidden_dim,))
            cells.append((w_ih, b_ih, w_hh, b_hh))
            in_dim = self.lstm_hidden_dim
        fl_k = self.param("from_linear_kernel", torch_kernel_init,
                          (self.lstm_hidden_dim, enc_numel))
        fl_b = self.param("from_linear_bias", torch_bias_init(self.lstm_hidden_dim),
                          (enc_numel,))
        d1_k, d1_b = make_conv_params(self, "dec1", 256, 128, 3)
        d2_k, d2_b = make_conv_params(self, "dec2", 128, 64, 3)
        d3_k, d3_b = make_conv_params(self, "dec3", 64, c, 7)

        # --- pure helpers (closed over arrays; usable in lax.scan bodies) ---
        def encode(frames):  # [n, h, w, c] -> [n, bottleneck]
            y = jax.nn.relu(conv2d(frames, e1_k, e1_b, 2, 3))
            y = jax.nn.relu(conv2d(y, e2_k, e2_b, 2, 1, padding_mode="replicate"))
            y = jax.nn.relu(conv2d(y, e3_k, e3_b, 2, 1, padding_mode="replicate"))
            return (y.reshape(y.shape[0], -1) @ tl_k.astype(y.dtype)
                    + tl_b.astype(y.dtype))

        def decode(latent):  # [n, hidden] -> [n, h, w, c]
            y = (latent @ fl_k.astype(latent.dtype)
                 + fl_b.astype(latent.dtype)).reshape(-1, eh, ew, ec)
            y = jax.nn.relu(conv_transpose2d(y, d1_k, d1_b, 2, 1))
            y = jax.nn.relu(conv_transpose2d(y, d2_k, d2_b, 2, 1))
            y = conv_transpose2d(y, d3_k, d3_b, 2, 3)
            return resize_bilinear(y, (ih, iw))

        def stack_step(states, inp):
            new_states = []
            cur = inp
            for (w_ih, b_ih, w_hh, b_hh), (h, cc) in zip(cells, states):
                h, cc = _lstm_cell_step(cur, h, cc, w_ih, b_ih, w_hh, b_hh)
                new_states.append((h, cc))
                cur = h
            return new_states, cur

        if self.action_conditional:
            if actions is None or actions.shape[-1] != self.action_size:
                raise ValueError("Given actions are None or of the wrong size!")

            def with_action(latent, action):
                a = (action.reshape(b, -1).astype(latent.dtype)
                     @ ai_k.astype(latent.dtype) + ai_b.astype(latent.dtype))
                return jnp.concatenate([latent, a], axis=-1)
        else:
            def with_action(latent, action):
                return latent

        # warm-up: batched encode of all context frames, then scan
        enc_all = encode(x.reshape(b * t_in, ih, iw, c)).reshape(b, t_in, -1)
        states0 = [(jnp.zeros((b, self.lstm_hidden_dim), x.dtype),
                    jnp.zeros((b, self.lstm_hidden_dim), x.dtype))
                   for _ in range(self.lstm_num_layers)]

        def warmup_body(states, inp):
            latent, action = inp
            states, _ = stack_step(states, with_action(latent, action))
            return states, None

        act_seq = actions[:, :t_in] if self.action_conditional else jnp.zeros((b, t_in, 1), x.dtype)
        states, _ = lax.scan(lambda s, inp: warmup_body(s, inp), states0,
                             (jnp.moveaxis(enc_all, 1, 0), jnp.moveaxis(act_seq, 1, 0)))

        # first prediction from warm-up output
        first_latent_out = states[-1][0]
        first_pred = decode(first_latent_out)

        # autoregressive: encode own prediction, step, decode
        if self.action_conditional:
            fut_actions = actions[:, t_in:t_in + pred_frames]
        else:
            fut_actions = jnp.zeros((b, pred_frames, 1), x.dtype)

        def ar_body(carry, action):
            states, prev_pred = carry
            latent = with_action(encode(prev_pred), action)
            states, out = stack_step(states, latent)
            pred = decode(out)
            return (states, pred), pred

        if self.remat:
            ar_body = jax.checkpoint(ar_body)
        if pred_frames > 1:
            (_, _), more_preds = lax.scan(
                ar_body, (states, first_pred),
                jnp.moveaxis(fut_actions[:, :pred_frames - 1], 1, 0))
            preds = jnp.concatenate([first_pred[:, None],
                                     jnp.moveaxis(more_preds, 0, 1)], axis=1)
        else:
            preds = first_pred[:, None]
        return preds, None
