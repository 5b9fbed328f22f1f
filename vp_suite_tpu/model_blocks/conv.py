r"""Convolutional model blocks (UNet double-convs, DCGAN convs).

Capability parity with ``vp_suite/model_blocks/conv.py:9-95``, on NHWC layout.
"""
import flax.linen as nn
import jax

from vp_suite_tpu.base.base_model_block import VPModelBlock
from vp_suite_tpu.nn.layers import Conv2d, Conv3d, ConvTranspose2d, GroupNorm


class DoubleConv2d(VPModelBlock):
    r"""UNet 2-D double conv: (replicate-pad conv → BatchNorm → ReLU) x 2
    (parity: ``conv.py:9-31``)."""
    NAME = "DoubleConv2d"
    PAPER_REFERENCE = "arxiv.org/abs/1505.04597"

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.out_channels, 3, 1, 1, use_bias=False,
                   padding_mode="replicate", name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x)
        x = jax.nn.relu(x)
        x = Conv2d(self.out_channels, 3, 1, 1, use_bias=False,
                   padding_mode="replicate", name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(x)
        return jax.nn.relu(x)


class DoubleConv3d(VPModelBlock):
    r"""UNet 3-D double conv over NDHWC (parity: ``conv.py:34-55``).

    ``merged_time=td`` runs the TPU-first time-in-channels layout
    (``[b, h, w, td*c]``, see :class:`~vp_suite_tpu.nn.layers.Conv3d`); the
    BatchNorms normalize per TRUE channel by viewing the merged axis as
    ``[td, c]`` for the reduction — identical statistics to the NDHWC form.
    """
    NAME = "DoubleConv3d"

    in_channels: int
    out_channels: int
    merged_time: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        td = self.merged_time

        def bn(y, name):
            layer = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=name)
            if not td:
                return layer(y)
            v = y.reshape(*y.shape[:-1], td, self.out_channels)
            return layer(v).reshape(y.shape)

        x = Conv3d(self.out_channels, 3, 1, 1, use_bias=False,
                   padding_mode="replicate", merged_time=td, name="conv1")(x)
        x = jax.nn.relu(bn(x, "bn1"))
        x = Conv3d(self.out_channels, 3, 1, 1, use_bias=False,
                   padding_mode="replicate", merged_time=td, name="conv2")(x)
        return jax.nn.relu(bn(x, "bn2"))


class DCGANConv(VPModelBlock):
    r"""DCGAN conv: conv 3x3 → GroupNorm(16) → LeakyReLU(0.2)
    (parity: ``conv.py:58-74``)."""
    NAME = "DCGAN - Conv"
    PAPER_REFERENCE = "arxiv.org/abs/1511.06434"

    in_channels: int
    out_channels: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.out_channels, 3, self.stride, 1, name="conv")(x)
        x = GroupNorm(16, name="gn")(x)
        return jax.nn.leaky_relu(x, negative_slope=0.2)


class DCGANConvTranspose(VPModelBlock):
    r"""DCGAN convT: convT 3x3 → GroupNorm(16) → LeakyReLU(0.2)
    (parity: ``conv.py:77-95``; output_padding = 1 iff stride == 2)."""
    NAME = "DCGAN - ConvTranspose"
    PAPER_REFERENCE = "arxiv.org/abs/1511.06434"

    in_channels: int
    out_channels: int
    stride: int

    @nn.compact
    def __call__(self, x):
        output_pad = int(self.stride == 2)
        x = ConvTranspose2d(self.out_channels, 3, self.stride, 1,
                            output_padding=output_pad, name="conv")(x)
        x = GroupNorm(16, name="gn")(x)
        return jax.nn.leaky_relu(x, negative_slope=0.2)
