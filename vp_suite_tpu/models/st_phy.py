r"""ST-Phy — TPU-native.

Capability parity with ``vp_suite/models/st_phy.py:16-216``: hybrid
PhyDNet x PredRNN model — per layer one PhyCell cell and one (AC-)ST-LSTM
cell, merged by a 1x1 conv; shared adapter + memory-decoupling loss; K2M
moment loss; scheduled teacher forcing.

Same TPU-native re-design as PhyDNet: the whole trajectory is one
``lax.scan`` with explicit hidden-state carries and a traced teacher-forcing
blend; the autoencoder is applied batched where possible.
"""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from vp_suite_tpu.base.base_model import VPModel
from vp_suite_tpu.model_blocks._functional import (
    conv2d, conv_transpose2d, make_conv_params)
from vp_suite_tpu.model_blocks.predrnn import make_st_lstm_cell
from vp_suite_tpu.model_blocks.phydnet import (
    make_phycell_cell, moment_loss, moment_constraints)
from vp_suite_tpu.nn.layers import torch_kernel_init
from vp_suite_tpu.ops.image import resize_bilinear
from vp_suite_tpu.utils.models import conv_output_shape


class STPhy(VPModel):
    NAME = "ST-Phy"
    CAN_HANDLE_ACTIONS = True
    TRAIN_REGIME = "teacher_forcing"

    num_layers: int = 3
    phycell_channels: int = 49
    phycell_kernel_size: Tuple = (7, 7)
    st_cell_channels: int = 64
    inflated_action_dim: int = 3

    decoupling_loss_scale: float = 100.0
    moment_loss_scale: float = 1.0
    scan_unroll: int = 1  #: time-loop unroll; 0 = auto (full for short seqs).
    teacher_forcing_decay: float = 0.003

    @property
    def _enc_hw(self):
        h, w = self.img_h, self.img_w
        h, w = conv_output_shape((h, w), 5, 2, 0)
        h, w = conv_output_shape((h, w), 3, 2, 0)
        h, w = conv_output_shape((h, w), 3, 1, 0)
        return h, w

    @nn.compact
    def __call__(self, x, pred_frames: int = 1, actions=None, train: bool = False,
                 teacher_forcing=False, **kwargs):
        b = x.shape[0]
        context_frames = x.shape[1] - pred_frames if train else x.shape[1]
        eh, ew = self._enc_hw
        c = self.img_c
        stc = self.st_cell_channels
        n_steps = context_frames + pred_frames - 1

        if self.action_conditional:
            if actions is None or actions.shape[-1] != self.action_size:
                raise ValueError("Given actions are None or of the wrong size!")
        if actions is None:
            actions = jnp.zeros((b, n_steps, max(self.action_size, 1)), x.dtype)

        # --- autoencoder params (functional form of model_blocks/enc.py:47-97) ---
        e1_k, e1_b = make_conv_params(self, "ae_enc_conv1", c, 32, (5, 5))
        e2_k, e2_b = make_conv_params(self, "ae_enc_conv2", 32, 64, (3, 3))
        e3_k, e3_b = make_conv_params(self, "ae_enc_mean", 64, stc, (3, 3))
        fc_k, fc_b = make_conv_params(self, "ae_dec_fc1", stc, stc, (1, 1))
        dc1_k, dc1_b = make_conv_params(self, "ae_dec_conv1", stc, 64, (6, 6))
        dc2_k, dc2_b = make_conv_params(self, "ae_dec_conv2", 64, 32, (6, 6))
        dc3_k, dc3_b = make_conv_params(self, "ae_dec_conv3", 32, c, (5, 5))

        def encode(frames):
            y = jax.nn.relu(conv2d(frames, e1_k, e1_b, 2, 0))
            y = jax.nn.relu(conv2d(y, e2_k, e2_b, 2, 0))
            y = jax.nn.relu(conv2d(y, e3_k, e3_b, 1, 0))
            norm = jnp.sqrt(jnp.sum(y * y, axis=-2, keepdims=True))  # width-axis L2 norm
            return y / jnp.maximum(norm, 1e-8)

        def decode(z):
            y = jax.nn.relu(conv2d(z, fc_k, fc_b, 1, 0))
            y = jax.nn.relu(conv_transpose2d(y, dc1_k, dc1_b, 2, 0))
            y = jax.nn.relu(conv_transpose2d(y, dc2_k, dc2_b, 2, 0))
            y = conv_transpose2d(y, dc3_k, dc3_b, 1, 0)
            return resize_bilinear(y, (self.img_h, self.img_w))

        # --- cells ---
        dim_st = [stc] * self.num_layers
        st_cells, phycells, hidden_convs = [], [], []
        for i in range(self.num_layers):
            cell_in = dim_st[0] if i == 0 else dim_st[i - 1]
            st_cells.append(make_st_lstm_cell(
                self, f"st_cell{i}", cell_in, dim_st[i], eh, ew, 5, 1, True,
                action_conditional=self.action_conditional))
            phycells.append(make_phycell_cell(
                self, f"phycell{i}", cell_in, self.action_conditional, self.action_size,
                self.phycell_channels, self.phycell_kernel_size))
            hc_bias = i < self.num_layers - 1
            hidden_convs.append(make_conv_params(
                self, f"hidden_conv{i}", stc + dim_st[i], stc, (1, 1), use_bias=hc_bias))

        if self.action_conditional:
            ai_k = self.param("action_inflate_kernel", torch_kernel_init,
                              (self.action_size, self.inflated_action_dim * eh * ew))
            ah_k, _ = make_conv_params(self, "action_conv_h", self.inflated_action_dim,
                                       stc, (5, 1), use_bias=False)
            aw_k, _ = make_conv_params(self, "action_conv_w", self.inflated_action_dim,
                                       stc, (1, 5), use_bias=False)

        ad_k, _ = make_conv_params(self, "adapter", dim_st[0], dim_st[0], (1, 1),
                                   use_bias=False)

        def normalized_adapter(delta):
            v = conv2d(delta, ad_k, None, 1, 0)
            v = v.reshape(v.shape[0], -1, v.shape[-1])
            n = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
            return v / jnp.maximum(n, 1e-12)

        # --- scan ---
        tf_flag = jnp.asarray(teacher_forcing, x.dtype) if train else jnp.asarray(0.0, x.dtype)
        total_x = x
        if total_x.shape[1] < n_steps:
            pad = jnp.zeros((b, n_steps - total_x.shape[1], *x.shape[2:]), x.dtype)
            total_x = jnp.concatenate([total_x, pad], axis=1)
        use_gt = jnp.concatenate([
            jnp.ones((context_frames,), x.dtype),
            jnp.full((n_steps - context_frames,), tf_flag, x.dtype)])

        # batched encode of all ground-truth frames (hoisted out of the scan)
        enc_all = encode(total_x[:, :n_steps].reshape(b * n_steps, *x.shape[2:]))
        enc_all = enc_all.reshape(b, n_steps, eh, ew, stc)

        def step(carry, inp):
            phy_h, st_h, st_c, st_memory, x_gen, dl_sum = carry
            enc_t, a_t, g = inp
            next_input = g * enc_t + (1.0 - g) * x_gen

            if self.action_conditional:
                # the inflate output vector is interpreted CHANNEL-major
                # ((iad, h, w), torch .view semantics — st_phy.py:141) so the
                # linear's weight stays torch-checkpoint-mappable
                ac = (a_t.astype(next_input.dtype) @ ai_k.astype(next_input.dtype)) \
                    .reshape(-1, self.inflated_action_dim, eh, ew) \
                    .transpose(0, 2, 3, 1)
                inflated_action = (conv2d(ac, ah_k, None, 1, (2, 0))
                                   + conv2d(ac, aw_k, None, 1, (0, 2)))

            phy_h, st_h, st_c = list(phy_h), list(st_h), list(st_c)
            for i in range(self.num_layers):
                phy_h[i] = phycells[i](next_input, a_t, phy_h[i])
                if self.action_conditional:
                    st_h[i], st_c[i], st_memory, dc, dm = st_cells[i](
                        next_input, st_h[i], st_c[i], st_memory, inflated_action)
                else:
                    st_h[i], st_c[i], st_memory, dc, dm = st_cells[i](
                        next_input, st_h[i], st_c[i], st_memory)
                ndc = normalized_adapter(dc)
                ndm = normalized_adapter(dm)
                dl_sum = dl_sum + jnp.mean(jnp.abs(jnp.sum(ndc * ndm, axis=1)))
                hk, hb = hidden_convs[i]
                x_gen = conv2d(jnp.concatenate([st_h[i], phy_h[i]], axis=-1), hk, hb, 1, 0)

            out_frame = decode(x_gen)
            return (tuple(phy_h), tuple(st_h), tuple(st_c), st_memory, x_gen, dl_sum), out_frame

        zeros_st = tuple(jnp.zeros((b, eh, ew, d), x.dtype) for d in dim_st)
        phy_h0 = tuple(jnp.zeros((b, eh, ew, stc), x.dtype) for _ in range(self.num_layers))
        carry0 = (phy_h0, zeros_st, zeros_st, jnp.zeros((b, eh, ew, dim_st[0]), x.dtype),
                  jnp.zeros((b, eh, ew, stc), x.dtype), jnp.float32(0.0))
        xs = (jnp.moveaxis(enc_all, 1, 0), jnp.moveaxis(actions[:, :n_steps], 1, 0), use_gt)
        if self.remat:
            step = jax.checkpoint(
                step, policy=jax.checkpoint_policies.save_only_these_names("st_gates"))
        from vp_suite_tpu.model_blocks._functional import auto_unroll
        (_, _, _, _, _, dl_sum), outs = lax.scan(
            step, carry0, xs, unroll=auto_unroll(self.scan_unroll, n_steps))
        outs = jnp.moveaxis(outs, 0, 1)

        out_frames = outs if train else outs[:, context_frames - 1:]

        model_losses = None
        if train:
            constraints = moment_constraints(self.phycell_channels, self.phycell_kernel_size)
            f1_kernel = phycells[0].f_conv1_kernel()
            # scale applied inside AND outside the mean (reference quirk,
            # st_phy.py:173,176) -> scale^2 on the base value
            m_loss = self.moment_loss_scale * moment_loss(
                jnp.asarray(f1_kernel, jnp.float32), constraints, self.phycell_kernel_size)
            decoupling = dl_sum / (self.num_layers * n_steps)
            model_losses = {
                "moment regularization loss": self.moment_loss_scale * m_loss,
                "memory decoupling loss": self.decoupling_loss_scale * decoupling,
            }
        return out_frames, model_losses
