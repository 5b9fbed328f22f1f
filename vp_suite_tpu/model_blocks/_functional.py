r"""Functional conv/norm helpers for recurrent cell internals.

Recurrent blocks in this framework create their parameters explicitly (via
``flax`` ``self.param``) and run their time loops as pure ``jax.lax.scan``
bodies closing over those arrays. These helpers implement the raw ops with
PyTorch-parity semantics (see ``vp_suite_tpu/nn/layers.py`` for the module
versions and the parity rationale).
"""
import jax
import jax.numpy as jnp
from jax import lax

from vp_suite_tpu.nn.layers import torch_kernel_init, torch_bias_init, _pair


def conv2d(x, kernel, bias=None, stride=1, padding=0, dilation=1, padding_mode="constant"):
    r"""NHWC conv with torch Conv2d semantics. kernel: [kh, kw, in, out].

    Inside a :func:`vp_suite_tpu.parallel.spatial.spatial_halo_convs` context
    (and for plain constant-padding dilation-1 convs), lowers to an explicit
    halo-exchange ``shard_map`` region instead of letting XLA partition the
    conv — the workaround for XLA's spatial-sharding miscompiles."""
    from vp_suite_tpu.parallel.spatial import active_spatial, halo_conv2d
    sp = active_spatial()
    if sp is not None and x.ndim == 4 and padding_mode == "constant" \
            and _pair(dilation) == (1, 1):
        return halo_conv2d(x, kernel, bias, stride, padding, *sp)
    s = _pair(stride)
    p = _pair(padding)
    d = _pair(dilation)
    if padding_mode == "constant":
        pad = [(p[0], p[0]), (p[1], p[1])]
    else:
        mode = "edge" if padding_mode == "replicate" else padding_mode
        x = jnp.pad(x, [(0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)], mode=mode)
        pad = [(0, 0), (0, 0)]
    y = lax.conv_general_dilated(x, kernel.astype(x.dtype), window_strides=s, padding=pad,
                                 rhs_dilation=d, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def conv_transpose2d(x, kernel, bias=None, stride=1, padding=0, output_padding=0):
    r"""NHWC transposed conv with torch ConvTranspose2d semantics.
    kernel: [kh, kw, in, out]. Spatial-context routing: see :func:`conv2d`."""
    from vp_suite_tpu.parallel.spatial import active_spatial, \
        halo_conv_transpose2d
    sp = active_spatial()
    if sp is not None and x.ndim == 4:
        return halo_conv_transpose2d(x, kernel, bias, stride, padding,
                                     output_padding, *sp)
    k = (kernel.shape[0], kernel.shape[1])
    s = _pair(stride)
    p = _pair(padding)
    op = _pair(output_padding)
    flipped = jnp.flip(kernel, axis=(0, 1))
    pad = [(k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(2)]
    y = lax.conv_general_dilated(x, flipped.astype(x.dtype), window_strides=(1, 1),
                                 padding=pad, lhs_dilation=s,
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def group_norm(x, scale, bias, num_groups, eps=1e-5):
    r"""GroupNorm over NHWC (torch parity). Affine params are cast to the
    activation dtype so mixed-precision scan carries stay uniform."""
    c = x.shape[-1]
    g = num_groups
    orig_shape = x.shape
    xg = x.reshape(*orig_shape[:-1], g, c // g)
    red = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mean = xg.mean(axis=red, keepdims=True)
    var = xg.var(axis=red, keepdims=True)
    xn = ((xg - mean) * lax.rsqrt(var + eps)).reshape(orig_shape)
    return xn * scale.astype(x.dtype) + bias.astype(x.dtype)


def layer_norm_chw(x, scale, bias, eps=1e-5):
    r"""torch LayerNorm([c,h,w]) parity on NHWC; scale/bias [h, w, c]."""
    mean = x.mean(axis=(-3, -2, -1), keepdims=True)
    var = x.var(axis=(-3, -2, -1), keepdims=True)
    return ((x - mean) * lax.rsqrt(var + eps) * scale.astype(x.dtype)
            + bias.astype(x.dtype))


def make_dcgan_conv(module, name, in_c, out_c, stride):
    r"""DCGAN conv (conv3x3 -> GroupNorm(16) -> LeakyReLU(0.2)) as a pure
    closure (functional form of ``model_blocks/conv.py:58-74``)."""
    import flax.linen as nn
    k, b = make_conv_params(module, f"{name}_conv", in_c, out_c, (3, 3))
    scale = module.param(f"{name}_gn_scale", nn.initializers.ones, (out_c,))
    bias = module.param(f"{name}_gn_bias", nn.initializers.zeros, (out_c,))

    def apply(x):
        y = conv2d(x, k, b, stride, 1)
        y = group_norm(y, scale, bias, 16)
        return jax.nn.leaky_relu(y, negative_slope=0.2)
    return apply


def make_dcgan_conv_transpose(module, name, in_c, out_c, stride):
    r"""DCGAN convT (convT3x3 -> GroupNorm(16) -> LeakyReLU(0.2)) as a pure
    closure (functional form of ``model_blocks/conv.py:77-95``)."""
    import flax.linen as nn
    k, b = make_conv_params(module, f"{name}_conv", in_c, out_c, (3, 3))
    scale = module.param(f"{name}_gn_scale", nn.initializers.ones, (out_c,))
    bias = module.param(f"{name}_gn_bias", nn.initializers.zeros, (out_c,))
    output_pad = int(stride == 2)

    def apply(x):
        y = conv_transpose2d(x, k, b, stride, 1, output_pad)
        y = group_norm(y, scale, bias, 16)
        return jax.nn.leaky_relu(y, negative_slope=0.2)
    return apply


def make_conv_params(module, name, in_c, out_c, kernel_size, use_bias=True):
    r"""Creates torch-initialized conv params on a flax module; returns
    (kernel, bias-or-None)."""
    k = _pair(kernel_size)
    kernel = module.param(f"{name}_kernel", torch_kernel_init, (*k, in_c, out_c))
    bias = None
    if use_bias:
        fan_in = in_c * k[0] * k[1]
        bias = module.param(f"{name}_bias", torch_bias_init(fan_in), (out_c,))
    return kernel, bias


def auto_unroll(scan_unroll, seq_len, cap=20):
    r"""Resolves a model's ``scan_unroll`` knob: 0 = auto (FULL unroll for
    short sequences — straight-line code lets XLA drop the while-loop state
    buffers, their zero-inits/copies and per-step dynamic slices; measured
    96.0 -> 93.3 ms on the flagship EF-ConvLSTM bench — and unroll=1
    otherwise, since PARTIAL unroll measured strictly worse)."""
    if scan_unroll == 0:
        return seq_len if seq_len <= cap else 1
    return scan_unroll
