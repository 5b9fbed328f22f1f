r"""PredRNN-V2 — TPU-native.

Capability parity with ``vp_suite/models/predrnn_v2.py:11-365``: stacked
ST-LSTM cells with a shared spatiotemporal memory flow, 4x4 patchify
(space-to-depth), memory-decoupling loss, three sampling regimes (standard
scheduled sampling, reverse scheduled sampling, test mask), optional
action-conditioning with input convs/deconvs + residuals, and
reversed-sequence training.

TPU-native re-design:

- The per-timestep cell stack runs as ONE ``jax.lax.scan`` over time with the
  layer hidden states, shared memory, and last generation as chip-resident
  carries (reference hot loop: ``predrnn_v2.py:171-224``).
- The reference's mutable training schedule (``training_iteration`` /
  ``sampling_eta``, ``predrnn_v2.py:124-126``) becomes explicit functional
  state: :meth:`init_model_state` + the pure :meth:`scheduled_sampling_mask`,
  which the training loop calls with a ``jax.random`` key and whose updated
  state it carries forward.
- Input blending is uniform: the sampling mask is prepended with ones for the
  warm-up steps, so the scan body is branch-free
  (``net = m*x_t + (1-m)*x_gen``).
"""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from vp_suite_tpu.base.base_model import VPModel
from vp_suite_tpu.model_blocks.predrnn import make_st_lstm_cell
from vp_suite_tpu.model_blocks._functional import conv2d, conv_transpose2d, make_conv_params
from vp_suite_tpu.ops.patch import patchify, unpatchify
from vp_suite_tpu.utils.models import conv_output_shape


class PredRNN_V2(VPModel):
    NAME = "PredRNN++"
    PAPER_REFERENCE = "https://arxiv.org/abs/2103.09504"
    CODE_REFERENCE = "https://github.com/thuml/predrnn-pytorch"
    MATCHES_REFERENCE = "Yes"
    CAN_HANDLE_ACTIONS = False
    NEEDS_COMPLETE_INPUT = True
    TRAIN_REGIME = "scheduled_sampling"

    patch_size: int = 4
    num_layers: int = 3
    num_hidden: Tuple = (128, 128, 128, 128)
    filter_size: int = 5
    stride: int = 1
    inflated_action_dim: int = 3
    layer_norm: bool = False
    conv_actions_on_input: bool = True
    residual_on_action_conv: bool = True

    scan_unroll: int = 0  #: time-loop unroll; 0 (default) = auto FULL unroll
    #: for short sequences (see ``model_blocks._functional.auto_unroll``).
    #: Round-5 TPU A/B at the bench config (14 scan steps, b32 KTH-shaped):
    #: unroll-1 157.2 ms / unroll-2 173.3 ms / FULL 142.8 ms (3,362 f/s,
    #: 88.4% MFU) — the flat graph removes the scan-boundary relayout copies
    #: that were 23% of the step (scripts/bench_predrnn_unroll.py).
    reverse_input: bool = True
    decoupling_loss_scale: float = 100.0
    scheduled_sampling: bool = True
    sampling_stop_iter: int = 50000
    sampling_changing_rate: float = 2e-5
    reverse_scheduled_sampling: bool = False
    r_sampling_step_1: int = 25000
    r_sampling_step_2: int = 50000
    r_exp_alpha: int = 5000

    # ------------------------------------------------------------------ #
    # derived shapes (parity: predrnn_v2.py:59-75)
    @property
    def patch_c(self):
        return self.patch_size * self.patch_size * self.img_c

    @property
    def patch_h(self):
        return self.img_h // self.patch_size

    @property
    def patch_w(self):
        return self.img_w // self.patch_size

    @property
    def _ac_mode(self):
        return self.action_conditional

    @property
    def _conv_on_input(self):
        # AC mode forces conv_actions_on_input (parity: predrnn_v2.py:65-70)
        return self.action_conditional

    @property
    def _rss(self):
        return True if self.action_conditional else self.reverse_scheduled_sampling

    @property
    def rnn_h(self):
        return self.patch_h // 4 if self._conv_on_input else self.patch_h

    @property
    def rnn_w(self):
        return self.patch_w // 4 if self._conv_on_input else self.patch_w

    def init_model_state(self):
        return {"training_iteration": 1, "sampling_eta": 1.0}

    # ------------------------------------------------------------------ #
    # scheduled sampling (pure; called by the training loop)
    def scheduled_sampling_mask(self, model_state, rng, batch_size, context_frames,
                                pred_frames, train: bool):
        r"""Returns (mask_true, new_model_state). Mask layout:
        [b, mask_frames, hp, wp, patch_c] (parity: ``predrnn_v2.py:252-317``)."""
        hp, wp, pc = self.patch_h, self.patch_w, self.patch_c
        eta = model_state["sampling_eta"]
        itr = model_state["training_iteration"]

        if not train:
            if self._rss:
                mask = jnp.zeros((batch_size, context_frames + pred_frames - 2, hp, wp, pc))
                mask = mask.at[:, :context_frames - 1].set(1.0)
            else:
                mask = jnp.zeros((batch_size, pred_frames - 1, hp, wp, pc))
            return mask, model_state

        if self._rss:
            r_eta = jnp.where(itr < self.r_sampling_step_1, 0.5,
                              jnp.where(itr < self.r_sampling_step_2,
                                        1.0 - 0.5 * jnp.exp(-(itr - self.r_sampling_step_1)
                                                            / self.r_exp_alpha), 1.0))
            eta2 = jnp.where(itr < self.r_sampling_step_1, 0.5,
                             jnp.where(itr < self.r_sampling_step_2,
                                       0.5 - (0.5 / (self.r_sampling_step_2 - self.r_sampling_step_1))
                                       * (itr - self.r_sampling_step_1), 0.0))
            k1, k2 = jax.random.split(rng)
            r_flip = jax.random.uniform(k1, (batch_size, context_frames - 1))
            flip = jax.random.uniform(k2, (batch_size, pred_frames - 1))
            r_mask = (r_flip < r_eta).astype(jnp.float32)
            mask_p = (flip < eta2).astype(jnp.float32)
            mask = jnp.concatenate([r_mask, mask_p], axis=1)
            mask = jnp.broadcast_to(mask[:, :, None, None, None],
                                    (batch_size, mask.shape[1], hp, wp, pc))
            # training_iteration advances once per train step (in the training
            # loop), not per mask draw — parity with train_iter (:364)
            return mask, model_state

        if not self.scheduled_sampling:
            mask = jnp.zeros((batch_size, pred_frames - 1, hp, wp, pc))
            return mask, model_state

        # standard scheduled sampling: eta decays BEFORE drawing (parity :289-297);
        # eta decays per mask draw (twice per step with reverse_input, like the
        # reference's double forward), iteration advances in the training loop
        new_eta = jnp.where(itr < self.sampling_stop_iter,
                            eta - self.sampling_changing_rate, 0.0)
        flip = jax.random.uniform(rng, (batch_size, pred_frames - 1))
        mask = (flip < new_eta).astype(jnp.float32)
        mask = jnp.broadcast_to(mask[:, :, None, None, None],
                                (batch_size, pred_frames - 1, hp, wp, pc))
        return mask, {**model_state, "sampling_eta": new_eta}

    # ------------------------------------------------------------------ #
    @nn.compact
    def __call__(self, x, pred_frames: int = 1, actions=None, train: bool = False,
                 mask_true=None, **kwargs):
        b, total_frames = x.shape[:2]
        context_frames = total_frames - pred_frames
        if context_frames < 1:
            raise ValueError(f"Model {self.NAME} needs input sequences that also include "
                             f"the target frames!")
        nh = list(self.num_hidden)
        rnn_h, rnn_w = self.rnn_h, self.rnn_w
        pc = self.patch_c

        x_patch = patchify(x, self.patch_size)  # [b, t, hp, wp, pc]
        if self._ac_mode:
            if actions is None or actions.shape[-1] != self.action_size:
                raise ValueError("Given actions are None or of the wrong size!")
            a_patch = jnp.broadcast_to(
                actions[:, :, None, None, :],
                (b, actions.shape[1], self.patch_h, self.patch_w, self.action_size))
        else:
            a_patch = None

        # --- create all params up front ---
        cells = []
        for i in range(self.num_layers):
            if i == 0:
                in_channel = nh[0] if self._conv_on_input else pc
            else:
                in_channel = nh[i - 1]
            cells.append(make_st_lstm_cell(
                self, f"cell{i}", in_channel, nh[i], rnn_h, rnn_w, self.filter_size,
                self.stride, self.layer_norm, action_conditional=self._ac_mode))

        if self._conv_on_input:
            fs, fp = self.filter_size, self.filter_size // 2
            ci1_k, _ = make_conv_params(self, "conv_input1", pc, nh[0] // 2, fs, use_bias=False)
            ci2_k, _ = make_conv_params(self, "conv_input2", nh[0] // 2, nh[0], fs, use_bias=False)
            ai1_k, _ = make_conv_params(self, "action_conv_input1", self.action_size,
                                        nh[0] // 2, fs, use_bias=False)
            ai2_k, _ = make_conv_params(self, "action_conv_input2", nh[0] // 2, nh[0], fs,
                                        use_bias=False)
            do1_k, _ = make_conv_params(self, "deconv_output1", nh[-1], nh[-1] // 2, fs,
                                        use_bias=False)
            do2_k, _ = make_conv_params(self, "deconv_output2", nh[-1] // 2, pc, fs,
                                        use_bias=False)
            # static output_padding so the deconvs exactly invert the strided
            # convs (reference passes output_size at runtime, predrnn_v2.py:215-219)
            mid_h = conv_output_shape((self.patch_h, self.patch_w), fs, 2, fp)
            op1 = (mid_h[0] - ((rnn_h - 1) * 2 - 2 * fp + fs),
                   mid_h[1] - ((rnn_w - 1) * 2 - 2 * fp + fs))
            op2 = (self.patch_h - ((mid_h[0] - 1) * 2 - 2 * fp + fs),
                   self.patch_w - ((mid_h[1] - 1) * 2 - 2 * fp + fs))
        else:
            cl_k, _ = make_conv_params(self, "conv_last", nh[self.num_layers - 1], pc, 1,
                                       use_bias=False)

        adap_nh = nh[self.num_layers - 1] if self._ac_mode else nh[0]
        ad_k, _ = make_conv_params(self, "adapter", adap_nh, adap_nh, 1, use_bias=False)

        # --- sampling mask ---
        first_blend = 1 if self._rss else context_frames
        if mask_true is None:
            mask_true, _ = self.scheduled_sampling_mask(
                self.init_model_state(), jax.random.PRNGKey(0), b, context_frames,
                pred_frames, train=False)
        # prepend ones for warm-up steps so the scan body is branch-free
        ones = jnp.ones((b, first_blend, self.patch_h, self.patch_w, pc), x.dtype)
        mask_full = jnp.concatenate([ones, mask_true.astype(x.dtype)], axis=1)
        mask_full = mask_full[:, :total_frames - 1]

        def normalized_adapter(delta):
            v = conv2d(delta, ad_k, None, 1, 0)
            v = v.reshape(v.shape[0], -1, v.shape[-1])       # [b, hw, c]
            n = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
            return v / jnp.maximum(n, 1e-12)

        def step(carry, inp):
            h_t, c_t, memory, x_gen, dl_sum = carry
            x_t, mask_t, a_t = inp
            net = mask_t * x_t + (1.0 - mask_t) * x_gen

            if self._conv_on_input:
                input_net1 = conv2d(net, ci1_k, None, 2, fp)
                input_net2 = conv2d(input_net1, ci2_k, None, 2, fp)
                net_in = input_net2
                action = conv2d(a_t, ai1_k, None, 2, fp)
                action = conv2d(action, ai2_k, None, 2, fp)
            else:
                net_in = net
                action = a_t

            h_new, c_new = list(h_t), list(c_t)
            cur = net_in
            for i in range(self.num_layers):
                if self._ac_mode:
                    h_i, c_i, memory, dc, dm = cells[i](cur, h_t[i], c_t[i], memory, action)
                else:
                    h_i, c_i, memory, dc, dm = cells[i](cur, h_t[i], c_t[i], memory)
                h_new[i], c_new[i] = h_i, c_i
                ndc = normalized_adapter(dc)
                ndm = normalized_adapter(dm)
                cos = jnp.sum(ndc * ndm, axis=1)             # [b, c]
                dl_sum = dl_sum + jnp.mean(jnp.abs(cos))
                cur = h_i

            if self._conv_on_input:
                if self.residual_on_action_conv:
                    y = conv_transpose2d(h_new[-1] + input_net2, do1_k, None, 2, fp, op1)
                    x_gen_new = conv_transpose2d(y + input_net1, do2_k, None, 2, fp, op2)
                else:
                    y = conv_transpose2d(h_new[-1], do1_k, None, 2, fp, op1)
                    x_gen_new = conv_transpose2d(y, do2_k, None, 2, fp, op2)
            else:
                x_gen_new = conv2d(h_new[-1], cl_k, None, 1, 0)
                if self._ac_mode:
                    x_gen_new = x_gen_new[..., :pc]
            return (tuple(h_new), tuple(c_new), memory, x_gen_new, dl_sum), x_gen_new

        zeros = lambda ch: jnp.zeros((b, rnn_h, rnn_w, ch), x.dtype)
        h0 = tuple(zeros(nh[i]) for i in range(self.num_layers))
        c0 = tuple(zeros(nh[i]) for i in range(self.num_layers))
        memory0 = zeros(nh[0])
        x_gen0 = jnp.zeros((b, self.patch_h, self.patch_w, pc), x.dtype)

        xs = (jnp.moveaxis(x_patch[:, :total_frames - 1], 1, 0),
              jnp.moveaxis(mask_full, 1, 0),
              jnp.moveaxis(a_patch[:, :total_frames - 1], 1, 0) if a_patch is not None
              else jnp.zeros((total_frames - 1, b, 1, 1, 1), x.dtype))
        if self.remat:
            step = jax.checkpoint(
                step, policy=jax.checkpoint_policies.save_only_these_names("st_gates"))
        from vp_suite_tpu.model_blocks._functional import auto_unroll
        (_, _, _, _, dl_sum), next_frames = lax.scan(
            step, (h0, c0, memory0, x_gen0, jnp.float32(0.0)), xs,
            unroll=auto_unroll(self.scan_unroll, total_frames - 1))

        preds_patch = jnp.moveaxis(next_frames[-pred_frames:], 0, 1)  # [b, p, hp, wp, pc]
        predictions = unpatchify(preds_patch, self.patch_size)
        decouple_loss = dl_sum / (self.num_layers * (total_frames - 1))
        return predictions, {"ST-LSTM decouple loss": self.decoupling_loss_scale * decouple_loss}
