r"""PhyDNet — TPU-native.

Capability parity with ``vp_suite/models/phydnet.py:12-174``: DCGAN encoder →
dual branch (PDE-constrained PhyCell + single-step ConvLSTM residual branch) →
summed decode with sigmoid; K2M moment-regularization loss; scheduled teacher
forcing during training.

TPU-native re-design:

- The whole warm-up + decode trajectory is ONE ``jax.lax.scan``; the carry
  holds both branches' hidden states and the previous output image. Teacher
  forcing is a traced 0/1 scalar blended into the input selection, so train
  and eval share a single compiled graph per mode (the reference re-runs the
  per-frame encoder in a Python loop, ``phydnet.py:106-122``).
- The reference's mutable per-module hidden state (``PhyCell.H``,
  ``phydnet.py:95-111``) is explicit scan carry.
- The per-epoch teacher-forcing coin flip lives in the training loop (a
  ``jax.random`` draw), not in module state.
"""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from vp_suite_tpu.base.base_model import VPModel
from vp_suite_tpu.model_blocks._functional import (
    conv2d, conv_transpose2d, make_conv_params, make_dcgan_conv,
    make_dcgan_conv_transpose)
from vp_suite_tpu.model_blocks.phydnet import (
    make_phycell_cell, moment_loss, moment_constraints)
from vp_suite_tpu.model_blocks.conv_lstm_ndrplz import convlstm_ndrplz_gates
from vp_suite_tpu.ops.image import resize_bilinear


class PhyDNet(VPModel):
    NAME = "PhyDNet"
    PAPER_REFERENCE = "https://arxiv.org/abs/2003.01460"
    CODE_REFERENCE = "https://github.com/vincent-leguen/PhyDNet"
    MATCHES_REFERENCE = "Not Yet"
    CAN_HANDLE_ACTIONS = True
    TRAIN_REGIME = "teacher_forcing"

    phycell_n_layers: int = 1
    phycell_channels: int = 49
    phycell_kernel_size: Tuple = (7, 7)
    convlstm_n_layers: int = 3
    convlstm_hidden_dims: Tuple = (128, 128, 64)
    convlstm_kernel_size: Tuple = (3, 3)

    moment_loss_scale: float = 1.0
    teacher_forcing_decay: float = 0.003
    scan_unroll: int = 1  #: time-loop unroll; 0 = auto (full for short seqs).

    @property
    def _enc_hw(self):
        # DCGAN encoder: s2, s1, s2 -> H/4 (64x64 -> 16x16)
        return self.img_h // 4, self.img_w // 4

    @nn.compact
    def __call__(self, x, pred_frames: int = 1, actions=None, train: bool = False,
                 teacher_forcing=False, **kwargs):
        b = x.shape[0]
        context_frames = x.shape[1] - pred_frames if train else x.shape[1]
        eh, ew = self._enc_hw
        c = self.img_c

        if self.action_conditional:
            if actions is None or actions.shape[-1] != self.action_size:
                raise ValueError("Given actions are None or of the wrong size!")
        n_steps = context_frames + pred_frames - 1
        if actions is None:
            actions = jnp.zeros((b, n_steps, max(self.action_size, 1)), x.dtype)

        # --- params (names mirror the reference module tree) ---
        enc_e1 = make_dcgan_conv(self, "encoder_E_c1", c, 32, 2)
        enc_e2 = make_dcgan_conv(self, "encoder_E_c2", 32, 32, 1)
        enc_e3 = make_dcgan_conv(self, "encoder_E_c3", 32, 64, 2)
        enc_ep1 = make_dcgan_conv(self, "encoder_Ep_c1", 64, 64, 1)
        enc_ep2 = make_dcgan_conv(self, "encoder_Ep_c2", 64, 64, 1)
        enc_er1 = make_dcgan_conv(self, "encoder_Er_c1", 64, 64, 1)
        enc_er2 = make_dcgan_conv(self, "encoder_Er_c2", 64, 64, 1)
        dec_dp1 = make_dcgan_conv_transpose(self, "decoder_Dp_upc1", 64, 64, 1)
        dec_dp2 = make_dcgan_conv_transpose(self, "decoder_Dp_upc2", 64, 64, 1)
        dec_dr1 = make_dcgan_conv_transpose(self, "decoder_Dr_upc1", 64, 64, 1)
        dec_dr2 = make_dcgan_conv_transpose(self, "decoder_Dr_upc2", 64, 64, 1)
        dec_d1 = make_dcgan_conv_transpose(self, "decoder_D_upc1", 64, 32, 2)
        dec_d2 = make_dcgan_conv_transpose(self, "decoder_D_upc2", 32, 32, 1)
        d3_k, d3_b = make_conv_params(self, "decoder_D_upc3", 32, c, (3, 3))

        phycells = [make_phycell_cell(self, f"phycell{i}", 64, self.action_conditional,
                                      self.action_size, self.phycell_channels,
                                      self.phycell_kernel_size)
                    for i in range(self.phycell_n_layers)]

        conv_cells = []
        cur_in = 64 + (self.action_size if self.action_conditional else 0)
        ck = self.convlstm_kernel_size
        cpad = (ck[0] // 2, ck[1] // 2)
        for i, hid in enumerate(self.convlstm_hidden_dims):
            kk, bb = make_conv_params(self, f"convcell{i}_conv", cur_in + hid, 4 * hid, ck)
            conv_cells.append((kk, bb, hid))
            cur_in = hid

        def decoder_D(z):
            y = dec_d1(z)
            y = dec_d2(y)
            y = conv_transpose2d(y, d3_k, d3_b, 2, 1, 1)
            return resize_bilinear(y, (self.img_h, self.img_w))

        def encoder_fwd(frame, action, phy_h, conv_h, conv_c):
            r"""One step of both branches (parity: ``phydnet.py:73-89``)."""
            z = enc_e3(enc_e2(enc_e1(frame)))
            input_phys = enc_ep2(enc_ep1(z))
            input_conv = enc_er2(enc_er1(z))

            # PhyCell stack (chained hiddens)
            new_phy = []
            cur = input_phys
            for j, cell in enumerate(phycells):
                h_j = cell(cur if j == 0 else new_phy[j - 1], action, phy_h[j])
                new_phy.append(h_j)

            # single-step ConvLSTM stack
            inp = input_conv
            if self.action_conditional:
                inflated = jnp.broadcast_to(action[:, None, None, :],
                                            (action.shape[0], eh, ew, action.shape[-1]))
                inp = jnp.concatenate([inp, inflated], axis=-1)
            new_ch, new_cc = [], []
            cur = inp
            from jax.ad_checkpoint import checkpoint_name
            for j, (kk, bb, hid) in enumerate(conv_cells):
                combined = jnp.concatenate([cur, conv_h[j]], axis=-1)
                gates = checkpoint_name(conv2d(combined, kk, bb, 1, cpad),
                                        "convlstm_gates")
                h_j, c_j = convlstm_ndrplz_gates(gates, conv_c[j])
                new_ch.append(h_j)
                new_cc.append(c_j)
                cur = h_j

            decoded_phys = dec_dp2(dec_dp1(new_phy[-1]))
            decoded_conv = dec_dr2(dec_dr1(new_ch[-1]))
            output_image = jax.nn.sigmoid(decoder_D(decoded_phys + decoded_conv))
            return tuple(new_phy), tuple(new_ch), tuple(new_cc), output_image

        # --- scan over warm-up + decode ---
        tf_flag = jnp.asarray(teacher_forcing, dtype=x.dtype) if train else jnp.asarray(0.0, x.dtype)
        total_x = x
        if total_x.shape[1] < n_steps + 1:
            pad = jnp.zeros((b, n_steps + 1 - total_x.shape[1], *x.shape[2:]), x.dtype)
            total_x = jnp.concatenate([total_x, pad], axis=1)

        # use ground truth for steps < context_frames; afterwards blend by tf_flag
        use_gt = jnp.concatenate([
            jnp.ones((context_frames,), x.dtype),
            jnp.full((n_steps - context_frames,), tf_flag, x.dtype)])

        def step(carry, inp):
            phy_h, conv_h, conv_c, prev_out = carry
            x_t, a_t, g = inp
            frame = g * x_t + (1.0 - g) * prev_out
            phy_h, conv_h, conv_c, out = encoder_fwd(frame, a_t, phy_h, conv_h, conv_c)
            return (phy_h, conv_h, conv_c, out), out

        phy_h0 = tuple(jnp.zeros((b, eh, ew, 64), x.dtype)
                       for _ in range(self.phycell_n_layers))
        conv_h0 = tuple(jnp.zeros((b, eh, ew, hid), x.dtype)
                        for (_, _, hid) in conv_cells)
        conv_c0 = conv_h0
        prev0 = jnp.zeros((b, self.img_h, self.img_w, c), x.dtype)

        xs = (jnp.moveaxis(total_x[:, :n_steps], 1, 0),
              jnp.moveaxis(actions[:, :n_steps], 1, 0),
              use_gt)
        if self.remat:
            step = jax.checkpoint(
                step, policy=jax.checkpoint_policies.save_only_these_names(
                    "convlstm_gates"))
        from vp_suite_tpu.model_blocks._functional import auto_unroll
        _, outs = lax.scan(step, (phy_h0, conv_h0, conv_c0, prev0), xs,
                           unroll=auto_unroll(self.scan_unroll, n_steps))
        outs = jnp.moveaxis(outs, 0, 1)  # [b, n_steps, h, w, c]

        if train:
            out_frames = outs  # from 2nd context frame onwards (parity :112,120)
        else:
            out_frames = outs[:, context_frames - 1:]

        model_losses = None
        if train:
            constraints = moment_constraints(self.phycell_channels, self.phycell_kernel_size)
            f1_kernel = phycells[0].f_conv1_kernel()
            m_loss = moment_loss(jnp.asarray(f1_kernel, jnp.float32), constraints,
                                 self.phycell_kernel_size)
            model_losses = {"moment regularization loss": self.moment_loss_scale * m_loss}
        return out_frames, model_losses
