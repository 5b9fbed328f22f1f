r"""UNet-3D video prediction model.

Capability parity with ``vp_suite/models/unet3d.py:9-131``: 3D-conv UNet over
a sliding window of ``temporal_dim`` frames; down path of DoubleConv3d blocks
with time-collapsing Conv3d skips, 2D bottleneck, transposed-conv up path with
skip concat; per-level action inflation; autoregressive window shift.

TPU-first layout: the down path runs TIME-IN-CHANNELS (``[b, h, w, td*c]``,
t-major channel blocks) — every 3-D conv lowers exactly to one 2-D conv
(banded block-channel kernel for the 3x3x3s, a 1x1 for the time-collapsing
skips; see ``nn/layers.Conv3d(merged_time=...)``), so the whole model is 2-D
convs XLA maps straight onto the MXU. Same FLOPs, same parameters, same
numerics; the NDTHWC 3-D lowering measured ~3% MFU on TPU v5e. The
autoregressive rollout is a Python loop over ``pred_frames`` (each step is a
full feed-forward UNet; params shared) — XLA unrolls and pipelines it.
"""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vp_suite_tpu.base.base_model import VPModel
from vp_suite_tpu.model_blocks.conv import DoubleConv3d, DoubleConv2d
from vp_suite_tpu.nn.layers import Conv2d, Conv3d, ConvTranspose2d, Dense
from vp_suite_tpu.ops.image import resize_bilinear


class UNet3D(VPModel):
    NAME = "UNet-3D"
    REQUIRED_ARGS = ["img_shape", "action_size", "tensor_value_range", "temporal_dim"]
    CAN_HANDLE_ACTIONS = True

    features: Tuple = (8, 16, 32, 64)
    temporal_dim: int = None

    @property
    def MIN_CONTEXT_FRAMES(self):  # noqa: N802  (parity: unet3d.py:25)
        return self.temporal_dim

    def setup(self):
        feats = list(self.features)
        td = self.temporal_dim
        self.downs = [DoubleConv3d(in_channels=-1, out_channels=f,
                                   merged_time=td, name=f"down{i}")
                      for i, f in enumerate(feats)]
        self.time3ds = [Conv3d(features=f, kernel_size=(td, 1, 1),
                               merged_time=td, name=f"time3d_{i}")
                        for i, f in enumerate(feats)]
        self.time3d_bn = Conv3d(features=feats[-1], kernel_size=(td, 1, 1),
                                merged_time=td, name="time3d_bn")
        bn_feat = feats[-1]
        if self.action_conditional:
            self.bottleneck = DoubleConv2d(in_channels=bn_feat + self.action_size,
                                           out_channels=bn_feat * 2, name="bottleneck")
        else:
            self.bottleneck = DoubleConv2d(in_channels=bn_feat, out_channels=bn_feat * 2,
                                           name="bottleneck")
        ups = []
        for i, f in enumerate(reversed(feats)):
            ups.append(ConvTranspose2d(features=f, kernel_size=2, strides=2,
                                       name=f"up_t{i}"))
            ups.append(DoubleConv2d(in_channels=f * 2, out_channels=f, name=f"up_c{i}"))
        self.ups = ups
        self.final_conv = Conv2d(features=self.img_c, kernel_size=1, name="final_conv")

        if self.action_conditional:
            # per-level action inflation linears sized to each level's (h, w)
            h, w = self.img_h, self.img_w
            inflates = []
            for i in range(len(feats)):
                inflates.append(Dense(features=self.action_size * h * w,
                                      name=f"action_inflate{i}"))
                h, w = h // 2, w // 2
            self.action_inflates_list = inflates
            self.bottleneck_action_inflate = Dense(features=self.action_size * h * w,
                                                   name="bottleneck_action_inflate")

    def pred_1(self, x, actions=None, train: bool = False, **kwargs):
        r"""x: [b, t>=temporal_dim, h, w, c] -> [b, h, w, c]
        (parity: ``unet3d.py:68-114``; down path runs time-in-channels,
        see module doc)."""
        t_in = x.shape[1]
        td = self.temporal_dim
        xw = x[:, -td:]  # [b, td, h, w, c]
        if self.action_conditional:
            if actions is None or actions.ndim != 3 or actions.shape[-1] != self.action_size:
                raise ValueError("Given actions are None or of the wrong size!")
            acts = actions[:, t_in - td:t_in]  # [b, td, a]

        # merge time into t-major channel blocks: [b, h, w, td*c]
        b = xw.shape[0]
        cur = jnp.moveaxis(xw, 1, 3)
        cur = cur.reshape(*cur.shape[:3], td * xw.shape[-1])
        skip_connections = []
        for i, (down, time3d) in enumerate(zip(self.downs, self.time3ds)):
            if self.action_conditional:
                hh, ww = cur.shape[1:3]
                inflated = self.action_inflates_list[i](acts.reshape(b * td, -1))
                inflated = inflated.reshape(b, td, self.action_size, hh, ww)
                inflated = jnp.transpose(inflated, (0, 3, 4, 1, 2))  # [b,h,w,td,a]
                cv = cur.reshape(b, hh, ww, td, -1)
                cur = jnp.concatenate([cv, inflated], axis=-1) \
                    .reshape(b, hh, ww, -1)
            cur = down(cur, train=train)       # [b, h, w, td*f]
            skip = time3d(cur)                 # collapse time -> [b, h, w, f]
            skip_connections.append(skip)
            cur = nn.max_pool(cur, window_shape=(2, 2), strides=(2, 2))

        cur = self.time3d_bn(cur)  # [b, h, w, f]
        if self.action_conditional:
            b = cur.shape[0]
            last_action = acts[:, -1]
            inflated = self.bottleneck_action_inflate(last_action)
            inflated = inflated.reshape(b, self.action_size, *cur.shape[1:3])
            inflated = jnp.transpose(inflated, (0, 2, 3, 1))
            cur = jnp.concatenate([cur, inflated], axis=-1)
        cur = self.bottleneck(cur, train=train)

        skip_connections = skip_connections[::-1]
        for i in range(0, len(self.ups), 2):
            cur = self.ups[i](cur)
            skip = skip_connections[i // 2]
            if cur.shape[1:3] != skip.shape[1:3]:
                cur = resize_bilinear(cur, skip.shape[1:3])
            cur = self.ups[i + 1](jnp.concatenate([skip, cur], axis=-1), train=train)
        return self.final_conv(cur)

    def __call__(self, x, pred_frames: int = 1, actions=None, train: bool = False, **kwargs):
        b, input_length = x.shape[:2]
        if actions is None and self.action_conditional:
            raise ValueError("action-conditional UNet3D needs actions")
        preds = []
        cur = x
        for t in range(pred_frames):
            if self.action_conditional:
                # reference parity (unet3d.py:124-128): pred_1 always slices
                # actions[:, T_in-td:T_in] of the FULL tensor — the action
                # window does NOT advance with the autoregressive shift
                act_window = actions[:, :input_length]
            else:
                act_window = None
            pred = self.pred_1(cur, actions=act_window, train=train)
            preds.append(pred[:, None])
            cur = jnp.concatenate([cur[:, 1:], pred[:, None]], axis=1)
        return jnp.concatenate(preds, axis=1), None
