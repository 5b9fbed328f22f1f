r"""Functional NN layers with PyTorch-compatible semantics.

The reference framework builds everything from ``torch.nn`` primitives; this
module provides the TPU-native equivalents on top of ``flax.linen`` /
``jax.lax``, with two extra guarantees:

1. **Numerical parity**: layer arithmetic (padding rules, transposed-conv
   output shapes, normalization reductions) matches PyTorch so that reference
   weights can be loaded and outputs compared within 1e-4 (the reference's own
   impl-match bar, ``tests/test_impl_match/_predrnn_v2.py:180``).
2. **TPU-friendly layout**: all image ops are NHWC (channels on vector lanes);
   convs lower to MXU matmuls via XLA.

Initializers default to torch's ``kaiming_uniform(a=sqrt(5))`` conv/linear
scheme so training dynamics are comparable out of the box.
"""
import math
from typing import Any, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _triple(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


# ---------------------------------------------------------------------------
# initializers (torch parity)

def torch_kernel_init(key, shape, dtype=jnp.float32):
    r"""torch Conv/Linear default: kaiming_uniform(a=sqrt(5)) == U(-b, b) with
    b = 1/sqrt(fan_in). For conv kernels [*spatial, in, out], fan_in =
    prod(spatial) * in."""
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init(fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


# ---------------------------------------------------------------------------
# padding helpers

def same_pad(kernel_size, dilation=1):
    r"""torch-style symmetric padding value k//2 (for odd kernels)."""
    k = _pair(kernel_size)
    d = _pair(dilation)
    return tuple(d[i] * (k[i] - 1) // 2 for i in range(2))


def _explicit_pad(x, padding, mode="constant", spatial_dims=2):
    r"""Pads the spatial dims of NHWC / NDHWC input."""
    pad_cfg = [(0, 0)] + [(p, p) for p in padding] + [(0, 0)]
    # x: [b, *spatial, c]
    if mode == "constant":
        return jnp.pad(x, pad_cfg)
    elif mode == "replicate":
        return jnp.pad(x, pad_cfg, mode="edge")
    elif mode == "reflect":
        return jnp.pad(x, pad_cfg, mode="reflect")
    raise ValueError(f"unknown padding mode: {mode}")


# ---------------------------------------------------------------------------
# conv layers

class Conv2d(nn.Module):
    r"""2-D convolution over NHWC input with torch ``nn.Conv2d`` semantics
    (explicit symmetric padding, optional 'replicate'/'reflect' padding mode,
    kaiming-uniform init)."""
    features: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    padding_mode: str = "constant"  # torch 'zeros'
    feature_group_count: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.strides)
        p = _pair(self.padding)
        d = _pair(self.dilation)
        in_c = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init,
                            (*k, in_c // self.feature_group_count, self.features))
        dtype = self.dtype or x.dtype
        from vp_suite_tpu.parallel.spatial import active_spatial, halo_conv2d
        sp = active_spatial()
        if sp is not None and x.ndim == 4 and self.padding_mode == "constant" \
                and d == (1, 1) and self.feature_group_count == 1:
            # spatial context: explicit halo-exchange shard_map conv (the
            # workaround for XLA's spatial-sharding miscompiles)
            y = halo_conv2d(x.astype(dtype), kernel, None, s, p, *sp)
        else:
            if self.padding_mode == "constant":
                pad = [(p[0], p[0]), (p[1], p[1])]
            else:
                x = _explicit_pad(x, p, self.padding_mode)
                pad = [(0, 0), (0, 0)]
            y = lax.conv_general_dilated(
                x.astype(dtype), kernel.astype(dtype), window_strides=s, padding=pad,
                rhs_dilation=d, feature_group_count=self.feature_group_count,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            fan_in = in_c // self.feature_group_count * k[0] * k[1]
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + bias.astype(dtype)
        return y


def _merged_time_kernel_2d(kernel, td, padding_mode):
    r"""Lowers a depth-3, depth-padding-1, depth-stride-1 3-D conv kernel
    ``[3, kh, kw, in_c, f]`` to the equivalent 2-D kernel
    ``[kh, kw, td*in_c, td*f]`` over a time-in-channels layout (t-major
    channel blocks). Output slice ``t`` of the 3-D conv reads padded depth
    slices ``t+dt-1``; with replicate depth padding those clamp to
    ``[0, td-1]``, so input block ``j`` feeds output block ``t`` with
    ``sum(K[dt] for dt: clip(t+dt-1) == j)``. For td <= 3 the banded block
    matrix is DENSE — the lowering costs exactly the same FLOPs as the 3-D
    conv but runs as ONE large-channel MXU conv instead of a depth-looped
    3-D lowering."""
    kh, kw, in_c, f = kernel.shape[1:]
    k2 = jnp.zeros((kh, kw, td * in_c, td * f), kernel.dtype)
    for t in range(td):
        for dt in range(3):
            j = t + dt - 1
            if padding_mode == "replicate":
                j = min(max(j, 0), td - 1)
            elif j < 0 or j >= td:
                continue
            k2 = k2.at[:, :, j * in_c:(j + 1) * in_c,
                       t * f:(t + 1) * f].add(kernel[dt])
    return k2


class Conv3d(nn.Module):
    r"""3-D convolution over NDHWC input with torch ``nn.Conv3d`` semantics.

    ``merged_time=td`` switches to a TPU-first time-in-channels layout:
    input/output are ``[b, h, w, td*c]`` (t-major channel blocks) and the
    conv lowers to a single 2-D conv — XLA:TPU maps 2-D convs straight onto
    the MXU, where the NDHWC 3-D lowering at UNet-3D's tiny channel counts
    ran at ~3% MFU. Two (exact) lowerings are supported, matching UNet-3D's
    uses (parity: ``vp_suite/models/unet3d.py:44-63``):

    - kernel ``(td, 1, 1)`` VALID: the time-collapsing skip conv becomes one
      1x1 conv ``[1, 1, td*c, f]`` -> output ``[b, h, w, f]``;
    - kernel ``(3, kh, kw)``, depth stride 1 / padding 1: a banded
      block-channel kernel (see :func:`_merged_time_kernel_2d`).

    Parameter shapes/layout are IDENTICAL in both modes (torch-mappable).
    """
    features: int
    kernel_size: Union[int, Tuple[int, int, int]]
    strides: Union[int, Tuple[int, int, int]] = 1
    padding: Union[int, Tuple[int, int, int]] = 0
    use_bias: bool = True
    padding_mode: str = "constant"
    dtype: Any = None
    merged_time: int = 0

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        s = _triple(self.strides)
        p = _triple(self.padding)
        td = self.merged_time
        in_c = x.shape[-1] // td if td else x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (*k, in_c, self.features))
        dtype = self.dtype or x.dtype
        if td:
            y = self._merged_call(x, kernel.astype(dtype), k, s, p, td, dtype)
        else:
            y = self._ndhwc_call(x, kernel, k, s, p, dtype)
        if self.use_bias:
            fan_in = in_c * k[0] * k[1] * k[2]
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
            bias = bias.astype(dtype)
            if td and y.shape[-1] == td * self.features:
                bias = jnp.tile(bias, td)  # one bias per t-major channel block
            y = y + bias
        return y

    def _ndhwc_call(self, x, kernel, k, s, p, dtype):
        if self.padding_mode == "constant":
            pad = [(pp, pp) for pp in p]
        else:
            pad_cfg = [(0, 0)] + [(pp, pp) for pp in p] + [(0, 0)]
            mode = "edge" if self.padding_mode == "replicate" else self.padding_mode
            x = jnp.pad(x, pad_cfg, mode=mode)
            pad = [(0, 0)] * 3
        return lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype), window_strides=s, padding=pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def _merged_call(self, x, kernel, k, s, p, td, dtype):
        x = x.astype(dtype)
        kt, kh, kw = k
        if kt == td and p[0] == 0 and s == (1, 1, 1) and (kh, kw) == (1, 1):
            # time-collapsing conv: [b, h, w, td*c] x [1, 1, td*c, f]
            k2 = kernel.reshape(td * kernel.shape[-2], kernel.shape[-1])
            return lax.conv_general_dilated(
                x, k2[None, None], (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if kt == 3 and p[0] == 1 and s == (1, 1, 1):
            k2 = _merged_time_kernel_2d(kernel, td, self.padding_mode)
            if self.padding_mode == "constant":
                pad = [(p[1], p[1]), (p[2], p[2])]
            else:
                mode = ("edge" if self.padding_mode == "replicate"
                        else self.padding_mode)
                x = jnp.pad(x, [(0, 0), (p[1], p[1]), (p[2], p[2]), (0, 0)],
                            mode=mode)
                pad = [(0, 0), (0, 0)]
            return lax.conv_general_dilated(
                x, k2, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        raise NotImplementedError(
            f"merged_time Conv3d supports kernel (td,1,1) VALID or "
            f"(3,kh,kw) depth-pad-1 only, got kernel={k} pad={p} stride={s}")


class ConvTranspose2d(nn.Module):
    r"""2-D transposed convolution with exact torch ``nn.ConvTranspose2d``
    semantics: ``out = (in-1)*stride - 2*padding + kernel + output_padding``.

    Implemented as an input-dilated convolution with a spatially-flipped
    kernel (the mathematical transpose of the forward correlation), which XLA
    lowers efficiently onto the MXU. Kernel stored as [kh, kw, in, out];
    torch checkpoints ([in, out, kh, kw]) convert via transpose(2,3,0,1).
    """
    features: int
    kernel_size: Union[int, Tuple[int, int]]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    output_padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.strides)
        p = _pair(self.padding)
        op = _pair(self.output_padding)
        in_c = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (*k, in_c, self.features))
        dtype = self.dtype or x.dtype
        from vp_suite_tpu.parallel.spatial import active_spatial, \
            halo_conv_transpose2d
        sp = active_spatial()
        if sp is not None and x.ndim == 4:
            # spatial context: see Conv2d
            y = halo_conv_transpose2d(x.astype(dtype), kernel, None, s, p,
                                      op, *sp)
        else:
            flipped = jnp.flip(kernel, axis=(0, 1))
            pad = [(k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(2)]
            y = lax.conv_general_dilated(
                x.astype(dtype), flipped.astype(dtype), window_strides=(1, 1), padding=pad,
                lhs_dilation=s, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            # torch ConvTranspose bias bound uses fan_in = in_c * kh * kw
            fan_in = in_c * k[0] * k[1]
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + bias.astype(dtype)
        return y


class Dense(nn.Module):
    r"""Linear layer with torch ``nn.Linear`` init semantics."""
    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (in_f, self.features))
        dtype = self.dtype or x.dtype
        y = x.astype(dtype) @ kernel.astype(dtype)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_f), (self.features,))
            y = y + bias.astype(dtype)
        return y


# ---------------------------------------------------------------------------
# normalization

class GroupNorm(nn.Module):
    r"""GroupNorm over NHWC input (torch ``nn.GroupNorm`` parity: normalizes
    per (group, h, w) with eps inside the sqrt)."""
    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        orig_shape = x.shape
        xg = x.reshape(*orig_shape[:-1], g, c // g)
        # normalize over all spatial dims + within-group channels
        red_axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        mean = xg.mean(axis=red_axes, keepdims=True)
        var = xg.var(axis=red_axes, keepdims=True)
        xg = (xg - mean) * lax.rsqrt(var + self.epsilon)
        xn = xg.reshape(orig_shape)
        return xn * scale + bias


class LayerNormCHW(nn.Module):
    r"""torch ``nn.LayerNorm([c, h, w])`` parity for NHWC input: normalizes
    each sample over all of (h, w, c) with per-element affine params.

    Param shape is [h, w, c] (torch stores [c, h, w]; converters transpose)."""
    feature_shape: Tuple[int, int, int]  # (h, w, c)
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, self.feature_shape)
        bias = self.param("bias", nn.initializers.zeros, self.feature_shape)
        mean = x.mean(axis=(-3, -2, -1), keepdims=True)
        var = x.var(axis=(-3, -2, -1), keepdims=True)
        return (x - mean) * lax.rsqrt(var + self.epsilon) * scale + bias


class BatchNorm(nn.Module):
    r"""BatchNorm over NHWC/NDHWC input (torch ``nn.BatchNorm2d/3d`` parity).
    Running statistics live in the 'batch_stats' collection; pass
    ``use_running_average=False`` during training."""
    use_running_average: bool = True
    momentum: float = 0.9  # torch momentum 0.1 == flax momentum 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average=None):
        ura = nn.merge_param("use_running_average", self.use_running_average
                             if use_running_average is None else use_running_average,
                             use_running_average)
        return nn.BatchNorm(use_running_average=ura, momentum=self.momentum,
                            epsilon=self.epsilon, name="bn")(x)


# ---------------------------------------------------------------------------
# pooling & activations

def max_pool_2d(x, window=2, strides=None, padding=0):
    w = _pair(window)
    s = _pair(strides if strides is not None else window)
    p = _pair(padding)
    return nn.max_pool(x, window_shape=w, strides=s,
                       padding=[(p[0], p[0]), (p[1], p[1])])


def max_pool_3d(x, window=(1, 2, 2), strides=None, padding=0):
    w = _triple(window)
    s = _triple(strides if strides is not None else w)
    p = _triple(padding)
    return nn.max_pool(x, window_shape=w, strides=s,
                       padding=[(pp, pp) for pp in p])


def leaky_relu(x, negative_slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)
