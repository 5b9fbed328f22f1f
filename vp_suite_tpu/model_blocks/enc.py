r"""Encoder / decoder / autoencoder model blocks.

Capability parity with ``vp_suite/model_blocks/enc.py:14-141`` on NHWC layout.
Shape probing (the reference runs zeros through the encoder at build time,
``enc.py:31-34``) becomes static conv arithmetic — under jit all shapes are
trace-time constants anyway.
"""
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vp_suite_tpu.base.base_model_block import VPModelBlock
from vp_suite_tpu.nn.layers import Conv2d, ConvTranspose2d
from vp_suite_tpu.model_blocks.conv import DCGANConv, DCGANConvTranspose
from vp_suite_tpu.ops.image import resize_bilinear
from vp_suite_tpu.utils.models import conv_output_shape


class Encoder(VPModelBlock):
    r"""Conv encoder: 5x5/s2 → 3x3/s2 → 3x3/s1 convs with ReLU, then
    L2-normalization along the width axis (parity with the reference's
    ``F.normalize(x, dim=-1)`` on NCHW, ``enc.py:64-69``)."""
    NAME = "Encoder"

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(Conv2d(32, 5, 2, 0, name="conv1")(x))
        x = jax.nn.relu(Conv2d(64, 3, 2, 0, name="conv2")(x))
        x = jax.nn.relu(Conv2d(self.out_channels, 3, 1, 0, name="mean_layer")(x))
        # reference normalizes dim=-1 of NCHW == the width axis == our axis -2
        norm = jnp.sqrt(jnp.sum(x * x, axis=-2, keepdims=True))
        return x / jnp.maximum(norm, 1e-8)


class Decoder(VPModelBlock):
    r"""Conv decoder mirroring :class:`Encoder` (parity: ``enc.py:72-97``)."""
    NAME = "Decoder"

    in_channels: int
    out_shape: Tuple[int, int, int]  #: (c, h, w), reference ordering.

    @nn.compact
    def __call__(self, x):
        out_c, out_h, out_w = self.out_shape
        x = jax.nn.relu(Conv2d(self.in_channels, 1, 1, 0, name="fc1")(x))
        x = jax.nn.relu(ConvTranspose2d(64, 6, 2, 0, name="conv1")(x))
        x = jax.nn.relu(ConvTranspose2d(32, 6, 2, 0, name="conv2")(x))
        x = ConvTranspose2d(out_c, 5, 1, 0, name="conv3")(x)
        return resize_bilinear(x, (out_h, out_w))


class Autoencoder(VPModelBlock):
    r"""Encoder + decoder pair (parity: ``enc.py:14-44``)."""
    NAME = "Autoencoder"

    img_shape: Tuple[int, int, int]  #: (c, h, w)
    encoded_channels: int

    def setup(self):
        self.encoder = Encoder(in_channels=self.img_shape[0],
                               out_channels=self.encoded_channels)
        self.decoder = Decoder(in_channels=self.encoded_channels, out_shape=self.img_shape)

    @property
    def encoded_shape(self):
        r"""(1, enc_c, enc_h, enc_w) — static conv arithmetic replacing the
        reference's zero-probe (``enc.py:31-34``)."""
        h, w = self.img_shape[1], self.img_shape[2]
        h, w = conv_output_shape((h, w), 5, 2, 0)
        h, w = conv_output_shape((h, w), 3, 2, 0)
        h, w = conv_output_shape((h, w), 3, 1, 0)
        return (1, self.encoded_channels, h, w)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, x):
        return self.decoder(x)

    def __call__(self, x):
        return self.decode(self.encode(x))


class DCGANEncoder(VPModelBlock):
    r"""DCGAN encoder 64->16 spatial (parity: ``enc.py:100-118``)."""
    NAME = "DCGAN Encoder"
    PAPER_REFERENCE = "arxiv.org/abs/1511.06434"

    img_channels: int = 1
    enc_channels: int = 32

    @nn.compact
    def __call__(self, x):
        x = DCGANConv(self.img_channels, self.enc_channels, stride=2, name="c1")(x)
        x = DCGANConv(self.enc_channels, self.enc_channels, stride=1, name="c2")(x)
        x = DCGANConv(self.enc_channels, 2 * self.enc_channels, stride=2, name="c3")(x)
        return x


class DCGANDecoder(VPModelBlock):
    r"""DCGAN decoder with final resize (parity: ``enc.py:121-141``)."""
    NAME = "DCGAN Decoder"
    PAPER_REFERENCE = "arxiv.org/abs/1511.06434"

    out_size: Tuple[int, int]
    img_channels: int = 1
    enc_channels: int = 32

    @nn.compact
    def __call__(self, x):
        x = DCGANConvTranspose(2 * self.enc_channels, self.enc_channels, stride=2, name="upc1")(x)
        x = DCGANConvTranspose(self.enc_channels, self.enc_channels, stride=1, name="upc2")(x)
        x = ConvTranspose2d(self.img_channels, 3, 2, 1, output_padding=1, name="upc3")(x)
        return resize_bilinear(x, self.out_size)


class EncoderSplit(VPModelBlock):
    r"""PhyDNet branch encoder: two stride-1 DCGAN convs
    (parity: ``model_blocks/phydnet.py:178-192``)."""
    NAME = "EncoderSplit"

    in_channels: int = 64
    enc_channels: int = 64

    @nn.compact
    def __call__(self, x):
        x = DCGANConv(self.in_channels, self.enc_channels, stride=1, name="c1")(x)
        x = DCGANConv(self.enc_channels, self.enc_channels, stride=1, name="c2")(x)
        return x


class DecoderSplit(VPModelBlock):
    r"""PhyDNet branch decoder: two stride-1 DCGAN convTs
    (parity: ``model_blocks/phydnet.py:195-209``)."""
    NAME = "DecoderSplit"

    out_channels: int = 64
    enc_channels: int = 64

    @nn.compact
    def __call__(self, x):
        x = DCGANConvTranspose(self.enc_channels, self.enc_channels, stride=1, name="upc1")(x)
        x = DCGANConvTranspose(self.enc_channels, self.out_channels, stride=1, name="upc2")(x)
        return x
