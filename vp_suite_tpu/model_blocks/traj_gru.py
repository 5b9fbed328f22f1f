r"""TrajGRU (Shi et al.) — TPU-native scan implementation.

Capability parity with the reference block
(``vp_suite/model_blocks/traj_gru.py:70-214``): a GRU whose hidden-to-hidden
connection follows L learned flow trajectories — per step, a small conv net
generates L flow fields, the hidden state is bilinearly warped along each
(negated) flow, and a 1x1 conv over the concatenated warps yields the h2h
gate pre-activations.

TPU-first restructuring (numerically identical):
- the input-to-hidden 3-gate conv is batched over all timesteps outside the
  scan (the reference also batches it, ``traj_gru.py:176-180``) and handed to
  the scan channel-major (the fused kernel's native layout);
- the L trajectory warps AND the 1x1 ``ret`` conv run as ONE fused Pallas
  pass (``ops.grid_sample.warp_flow_ret``; einsum twin
  ``warp_flow_multi`` + 1x1 conv elsewhere, torch ``F.grid_sample`` parity) —
  TPU gathers are serialization-bound, separable one-hot contractions ride
  the MXU instead, and the [b, P, L*f] warp tensor never exists in HBM;
- the recurrence is a ``lax.scan`` with chip-resident hidden state and
  channel-major gate math.

State height/width derive from the i2h conv arithmetic exactly like the
reference ``BaseConvRNN`` (``traj_gru.py:37-67``).
"""
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from vp_suite_tpu.base.base_model_block import VPModelBlock
from vp_suite_tpu.model_blocks._functional import conv2d, make_conv_params
from vp_suite_tpu.ops.grid_sample import warp_flow_ret


def conv_rnn_state_size(in_h, in_w, i2h_kernel, i2h_stride, i2h_pad, i2h_dilate=(1, 1)):
    r"""State size from i2h conv arithmetic (parity: ``traj_gru.py:58-65``)."""
    kh = 1 + (i2h_kernel[0] - 1) * i2h_dilate[0]
    kw = 1 + (i2h_kernel[1] - 1) * i2h_dilate[1]
    sh = (in_h + 2 * i2h_pad[0] - kh) // i2h_stride[0] + 1
    sw = (in_w + 2 * i2h_pad[1] - kw) // i2h_stride[1] + 1
    return sh, sw


class TrajGRU(VPModelBlock):
    NAME = "TrajGRU"
    PAPER_REFERENCE = "https://arxiv.org/abs/1706.03458"
    CODE_REFERENCE = "https://github.com/Hzzone/Precipitation-Nowcasting"
    MATCHES_REFERENCE = "Yes"

    in_channels: int
    enc_channels: int
    state_h: int            #: input feature-map height (reference ``in_h``).
    state_w: int
    zoneout: float = 0.0    #: per-channel prob of KEEPING the previous hidden
    #: state (intended zoneout semantics; needs a 'zoneout' rng). NOTE: the
    #: reference's zoneout branch (traj_gru.py:208-210) is inert — dropout2d
    #: over a zeros tensor stays zeros, so its torch.where always picks
    #: prev_h, freezing the state. We implement what it intends instead.
    #: Defaults to 0.0 (off) in every config, like the reference.
    L: int = 5
    i2h_kernel: Tuple[int, int] = (3, 3)
    i2h_stride: Tuple[int, int] = (1, 1)
    i2h_pad: Tuple[int, int] = (1, 1)
    h2h_kernel: Tuple[int, int] = (5, 5)
    h2h_dilate: Tuple[int, int] = (1, 1)
    act_slope: float = 0.2  #: LeakyReLU negative slope (reference Activation('leaky')).
    remat: bool = True      #: rematerialize the scan body in backward (HBM saver).
    time_major: bool = False  #: inputs/outputs are [t, b, ...] (see ConvLSTMShi).
    scan_unroll: int = 1  #: time-loop unroll; 0 = auto (full for short seqs).

    @nn.compact
    def __call__(self, inputs, states, seq_len: int):
        r"""inputs: [b, t, h, w, in_c] ([t, b, ...] when ``time_major``) or
        None; states: [b, sh, sw, enc] or None.
        Returns (outputs [b, t, sh, sw, enc] or time-major, next_h)."""
        f = self.enc_channels
        sh, sw = conv_rnn_state_size(self.state_h, self.state_w, self.i2h_kernel,
                                     self.i2h_stride, self.i2h_pad)
        i2h_k, i2h_b = make_conv_params(self, "i2h", self.in_channels, f * 3, self.i2h_kernel)
        i2f_k, i2f_b = make_conv_params(self, "i2f_conv1", self.in_channels, 32, (5, 5))
        h2f_k, h2f_b = make_conv_params(self, "h2f_conv1", f, 32, (5, 5))
        fl_k, fl_b = make_conv_params(self, "flows_conv", 32, self.L * 2, (5, 5))
        ret_k, ret_b = make_conv_params(self, "ret", f * self.L, f * 3, (1, 1))

        if inputs is None and states is None:
            raise ValueError("TrajGRU received 'None' both in input and state")
        if states is None:
            b = inputs.shape[1] if self.time_major else inputs.shape[0]
            states = jnp.zeros((b, sh, sw, f), dtype=inputs.dtype)
        b = states.shape[0]

        act = lambda v: jax.nn.leaky_relu(v, negative_slope=self.act_slope)

        if inputs is not None:
            bt = inputs.shape[0] * inputs.shape[1]
            x_flat = inputs.reshape(bt, *inputs.shape[2:])
            i2h = conv2d(x_flat, i2h_k, i2h_b, self.i2h_stride, self.i2h_pad)
            i2f = conv2d(x_flat, i2f_k, i2f_b, 1, (2, 2))
            # i2h goes to the scan CHANNEL-MAJOR [t, b, 3f, sh*sw]: the fused
            # warp+ret kernel emits gate pre-activations channel-major, so
            # hoisting ONE transpose of the whole stack here removes the
            # per-step [b, P, L*f]-sized layout copies the profiler flagged
            i2h = i2h.reshape(bt, sh * sw, 3 * f).transpose(0, 2, 1)
            if self.time_major:
                xs = (i2h.reshape(seq_len, b, 3 * f, sh * sw),
                      i2f.reshape(seq_len, b, *i2f.shape[1:]))
            else:
                i2h = i2h.reshape(b, seq_len, 3 * f, sh * sw)
                i2f = i2f.reshape(b, seq_len, *i2f.shape[1:])
                xs = (jnp.moveaxis(i2h, 1, 0), jnp.moveaxis(i2f, 1, 0))
        else:
            xs = None

        # ret weights viewed per flow for the fused kernel: conv kernel
        # [1, 1, L*f, 3f] -> [L, f, 3f] (warp channel blocks are in flow
        # order, so input channel l*f + c maps to (l, c))
        ret_w = ret_k.reshape(self.L, f, 3 * f)

        def flow_h2h(prev_h, i2f_step):
            r"""Generates L flows and returns the warp+ret gate
            pre-activations, channel-major [b, 3f, P]."""
            from jax.ad_checkpoint import checkpoint_name
            f_conv1 = conv2d(prev_h, h2f_k, h2f_b, 1, (2, 2))
            if i2f_step is not None:
                f_conv1 = f_conv1 + i2f_step
            flows = conv2d(act(f_conv1), fl_k, fl_b, 1, (2, 2))  # [b, sh, sw, 2L]
            # saving the (small) flow fields lets the backward skip the
            # flow-generator convs before re-running the warp VJP
            flows = checkpoint_name(flows, "trajgru_flows")
            # the L warps run in the Pallas kernels' native channel-major
            # layout and the 1x1 ret conv is a channel-major einsum on top —
            # no NHWC round trip (equals concat of per-flow
            # warp_flow(prev_h, -flow_l) blocks followed by the ret conv)
            return warp_flow_ret(prev_h, -flows, ret_w, ret_b)   # [b, 3f, P]

        # per-channel keep masks for zoneout, drawn for all steps upfront so
        # the scan body stays pure
        zo_masks = None
        if self.zoneout > 0.0:
            rng = self.make_rng("zoneout")
            zo_masks = jax.random.bernoulli(
                rng, self.zoneout, (seq_len, b, 1, 1, f))

        def _apply_zoneout(prev_h, next_h, mask):
            if mask is None:
                return next_h
            return jnp.where(mask, prev_h, next_h)

        def _gates_to_next_h(prev_h, h2h, i2h_step):
            r"""Gate math in the kernel's channel-major layout; prev_h in/out
            NHWC (ONE small [b, f, P] transpose each way — vs the [b, P, L*f]
            copies of the unfused path)."""
            prev_cm = prev_h.reshape(b, sh * sw, f).transpose(0, 2, 1)
            hr, hu, hm = jnp.split(h2h, 3, axis=1)
            if i2h_step is not None:
                ir, iu, im = jnp.split(i2h_step, 3, axis=1)
                reset = jax.nn.sigmoid(ir + hr)
                update = jax.nn.sigmoid(iu + hu)
                new_mem = act(im + reset * hm)
            else:
                reset = jax.nn.sigmoid(hr)
                update = jax.nn.sigmoid(hu)
                new_mem = act(reset * hm)
            next_cm = update * prev_cm + (1.0 - update) * new_mem
            return next_cm.transpose(0, 2, 1).reshape(b, sh, sw, f)

        def step_with_input(prev_h, x):
            i2h_step, i2f_step, mask = x
            h2h = flow_h2h(prev_h, i2f_step)
            next_h = _gates_to_next_h(prev_h, h2h, i2h_step)
            next_h = _apply_zoneout(prev_h, next_h, mask)
            return next_h, next_h

        def step_decode(prev_h, mask):
            h2h = flow_h2h(prev_h, None)
            next_h = _gates_to_next_h(prev_h, h2h, None)
            next_h = _apply_zoneout(prev_h, next_h, mask)
            return next_h, next_h

        if self.remat:
            # save flows (tiny) + the warp tensor: the backward needs the
            # warp for d_w anyway, and re-running the warp kernels is the
            # most expensive possible recompute (the step is MXU-bound)
            policy = jax.checkpoint_policies.save_only_these_names(
                "trajgru_flows", "warp_ret_warped")
            step_with_input = jax.checkpoint(step_with_input, policy=policy)
            step_decode = jax.checkpoint(step_decode, policy=policy)
        from vp_suite_tpu.model_blocks._functional import auto_unroll
        unroll = auto_unroll(self.scan_unroll, seq_len)
        if xs is not None:
            next_h, outputs = lax.scan(step_with_input, states, (*xs, zo_masks),
                                       unroll=unroll)
        else:
            next_h, outputs = lax.scan(step_decode, states, zo_masks,
                                       length=None if zo_masks is not None
                                       else seq_len, unroll=unroll)
        if not self.time_major:
            outputs = jnp.moveaxis(outputs, 0, 1)
        return outputs, next_h
