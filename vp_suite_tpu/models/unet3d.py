r"""UNet-3D video prediction model.

Capability parity with ``vp_suite/models/unet3d.py:9-131``: 3D-conv UNet over
a sliding window of ``temporal_dim`` frames; down path of DoubleConv3d blocks
with time-collapsing Conv3d skips, 2D bottleneck, transposed-conv up path with
skip concat; per-level action inflation; autoregressive window shift.

Layout is NDTHWC (time as depth). The autoregressive rollout is a Python loop
over ``pred_frames`` (each step is a full feed-forward UNet; params shared) —
XLA unrolls and pipelines it.
"""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vp_suite_tpu.base.base_model import VPModel
from vp_suite_tpu.model_blocks.conv import DoubleConv3d, DoubleConv2d
from vp_suite_tpu.nn.layers import Conv2d, Conv3d, ConvTranspose2d, max_pool_3d, Dense
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
        self.downs = [DoubleConv3d(in_channels=-1, out_channels=f, name=f"down{i}")
                      for i, f in enumerate(feats)]
        self.time3ds = [Conv3d(features=f, kernel_size=(self.temporal_dim, 1, 1),
                               name=f"time3d_{i}") for i, f in enumerate(feats)]
        self.time3d_bn = Conv3d(features=feats[-1], kernel_size=(self.temporal_dim, 1, 1),
                                name="time3d_bn")
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
        (parity: ``unet3d.py:68-114``)."""
        t_in = x.shape[1]
        xw = x[:, -self.temporal_dim:]  # [b, td, h, w, c] (NDTHWC: depth=time)
        if self.action_conditional:
            if actions is None or actions.ndim != 3 or actions.shape[-1] != self.action_size:
                raise ValueError("Given actions are None or of the wrong size!")
            acts = actions[:, t_in - self.temporal_dim:t_in]  # [b, td, a]

        skip_connections = []
        cur = xw
        for i, (down, time3d) in enumerate(zip(self.downs, self.time3ds)):
            if self.action_conditional:
                b, td, hh, ww, _ = cur.shape
                inflated = self.action_inflates_list[i](acts.reshape(b * td, -1))
                inflated = inflated.reshape(b, td, self.action_size, hh, ww)
                inflated = jnp.transpose(inflated, (0, 1, 3, 4, 2))  # [b, td, h, w, a]
                cur = jnp.concatenate([cur, inflated], axis=-1)
            cur = down(cur, train=train)
            skip = time3d(cur)[:, 0]  # collapse time -> [b, h, w, f]
            skip_connections.append(skip)
            cur = max_pool_3d(cur, window=(1, 2, 2))

        cur = self.time3d_bn(cur)[:, 0]  # [b, h, w, f]
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
                act_window = actions[:, t:input_length + t]
            else:
                act_window = None
            pred = self.pred_1(cur, actions=act_window, train=train)
            preds.append(pred[:, None])
            cur = jnp.concatenate([cur[:, 1:], pred[:, None]], axis=1)
        return jnp.concatenate(preds, axis=1), None
