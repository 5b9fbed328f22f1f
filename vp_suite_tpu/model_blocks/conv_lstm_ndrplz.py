r"""Convolutional LSTM (ndrplz variant) — TPU-native scan implementation.

Capability parity with the reference block
(``vp_suite/model_blocks/conv_lstm_ndrplz.py:7-149``): single 4-way gate conv
on ``concat([x, h])`` with gate order (i, f, o, g) and no peepholes; plus the
multi-layer sequence wrapper with per-layer unroll.

Same TPU-first restructuring as :class:`ConvLSTMShi`: the input half of the
gate conv is batched over all timesteps outside the ``lax.scan``.

Parameter layout: ``kernel [kh, kw, in+hidden, 4*hidden]`` (gate order
i, f, o, g on the last axis — note this differs from the Shi cell).
"""
import typing
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from vp_suite_tpu.base.base_model_block import VPModelBlock
from vp_suite_tpu.model_blocks._functional import conv2d, make_conv_params


def convlstm_ndrplz_gates(gates, c):
    r"""Gate elementwise block: gates [..., 4*hid] (i, f, o, g), c [..., hid].
    Returns (h_new, c_new). (Reference math: ``conv_lstm_ndrplz.py:28-43``.)"""
    gi, gf, go, gg = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(gi)
    f = jax.nn.sigmoid(gf)
    o = jax.nn.sigmoid(go)
    g = jnp.tanh(gg)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


class ConvLSTMCellNdrplz(VPModelBlock):
    r"""Single ndrplz ConvLSTM cell: one step per call. Used by PhyDNet's
    residual branch (``model_blocks/phydnet.py:117-175``)."""
    NAME = "ConvLSTM Cell (Palazzi, Abati)"
    CODE_REFERENCE = "https://github.com/ndrplz/ConvLSTM_pytorch"
    MATCHES_REFERENCE = "Yes (Code Reference)"

    input_dim: int
    hidden_dim: int
    kernel_size: Tuple[int, int] = (3, 3)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, state):
        r"""x: [b, h, w, in]; state: (h, c) each [b, h, w, hid]."""
        k = self.kernel_size
        pad = (k[0] // 2, k[1] // 2)
        kernel, bias = make_conv_params(self, "conv", self.input_dim + self.hidden_dim,
                                        4 * self.hidden_dim, k, use_bias=self.use_bias)
        h_cur, c_cur = state
        combined = jnp.concatenate([x, h_cur], axis=-1)
        gates = conv2d(combined, kernel, bias, 1, pad)
        return convlstm_ndrplz_gates(gates, c_cur)


class ConvLSTMNdrplz(VPModelBlock):
    r"""Multi-layer sequence ConvLSTM (parity: ``conv_lstm_ndrplz.py:51-149``).

    Layer-major unroll: each layer scans the full sequence produced by the
    previous layer (identical ordering to the reference's nested loops, but
    with the time loop compiled as ``lax.scan``).
    """
    NAME = "ConvLSTM (Palazzi, Abati)"
    CODE_REFERENCE = "https://github.com/ndrplz/ConvLSTM_pytorch"
    MATCHES_REFERENCE = "Yes (Code Reference)"

    input_dim: int
    hidden_dim: Union[int, Sequence[int]]
    kernel_size: Union[Tuple[int, int], Sequence[Tuple[int, int]]]
    num_layers: int
    batch_first: bool = False
    use_bias: bool = True
    return_all_layers: bool = False
    remat: bool = True

    @nn.compact
    def __call__(self, input_tensor, hidden_state=None):
        r"""input_tensor: [t, b, h, w, c] (or [b, t, h, w, c] if batch_first).

        Returns (layer_output_list, last_state_list) like the reference.
        """
        hidden_dims = [self.hidden_dim] * self.num_layers \
            if isinstance(self.hidden_dim, int) else list(self.hidden_dim)
        kernel_sizes = [self.kernel_size] * self.num_layers \
            if isinstance(self.kernel_size[0], int) else list(self.kernel_size)
        if not len(kernel_sizes) == len(hidden_dims) == self.num_layers:
            raise ValueError("Inconsistent list length.")  # parity: conv_lstm_ndrplz.py:70-71
        if not self.batch_first:
            input_tensor = jnp.moveaxis(input_tensor, 0, 1)  # -> [b, t, ...]
        if hidden_state is not None:
            raise NotImplementedError("stateful ConvLSTM not supported (parity with reference)")

        b, t, hh, ww, _ = input_tensor.shape
        cur = input_tensor
        layer_outputs, last_states = [], []
        in_dim = self.input_dim
        for li in range(self.num_layers):
            hid = hidden_dims[li]
            k = kernel_sizes[li]
            pad = (k[0] // 2, k[1] // 2)
            kernel, bias = make_conv_params(self, f"cell{li}_conv", in_dim + hid, 4 * hid,
                                            k, use_bias=self.use_bias)
            x_kernel = kernel[:, :, :in_dim, :]
            h_kernel = kernel[:, :, in_dim:, :]

            # hoisted input-half conv over all timesteps
            x_flat = cur.reshape(b * t, hh, ww, in_dim)
            i2h = conv2d(x_flat, x_kernel, bias, 1, pad).reshape(b, t, hh, ww, 4 * hid)
            i2h_t = jnp.moveaxis(i2h, 1, 0)

            def step(carry, i2h_step, _hk=h_kernel, _pad=pad):
                h, c = carry
                gates = i2h_step + conv2d(h, _hk, None, 1, _pad)
                h_new, c_new = convlstm_ndrplz_gates(gates, c)
                return (h_new, c_new), h_new

            if self.remat:
                step = jax.checkpoint(step)
            h0 = jnp.zeros((b, hh, ww, hid), dtype=cur.dtype)
            (h_last, c_last), outs = lax.scan(step, (h0, jnp.zeros_like(h0)), i2h_t)
            cur = jnp.moveaxis(outs, 0, 1)
            layer_outputs.append(cur)
            last_states.append((h_last, c_last))
            in_dim = hid

        if not self.return_all_layers:
            layer_outputs = layer_outputs[-1:]
            last_states = last_states[-1:]
        return layer_outputs, last_states
