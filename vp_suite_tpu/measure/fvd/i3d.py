r"""InceptionI3d feature extractor in JAX (NDTHWC layout).

TPU-native reimplementation of the I3D network used by the reference's FVD
measure (vendored torch code at
``vp_suite/measure/fvd/_pytorch_i3d/pytorch_i3d.py:13-342``). Same
architecture: Inception-v1 inflated to 3D, TF-'SAME' dynamic padding (which
for static shapes is exactly ``lax`` SAME padding), BatchNorm(eps=1e-3) in
inference mode, features = logits of the 400-class head.

Weights: converted torch checkpoint at ``resources/i3d_rgb_imagenet.npz`` if
present (see ``vp_suite_tpu.measure.convert_weights``); otherwise
deterministic random init (zero-egress environment — the reference's own
mounted copy also lacks the ckpt, ``fvd.py:33``), flagged via ``pretrained``.
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# (name, kind, cfg): conv = (out_c, kernel(t,h,w), stride); pool = (kernel, stride)
# inception cfg = [b0, b1a, b1b, b2a, b2b, b3b] output channels
_I3D_LAYERS = [
    ("Conv3d_1a_7x7", "conv", (64, (7, 7, 7), (2, 2, 2))),
    ("MaxPool3d_2a_3x3", "pool", ((1, 3, 3), (1, 2, 2))),
    ("Conv3d_2b_1x1", "conv", (64, (1, 1, 1), (1, 1, 1))),
    ("Conv3d_2c_3x3", "conv", (192, (3, 3, 3), (1, 1, 1))),
    ("MaxPool3d_3a_3x3", "pool", ((1, 3, 3), (1, 2, 2))),
    ("Mixed_3b", "mixed", [64, 96, 128, 16, 32, 32]),
    ("Mixed_3c", "mixed", [128, 128, 192, 32, 96, 64]),
    ("MaxPool3d_4a_3x3", "pool", ((3, 3, 3), (2, 2, 2))),
    ("Mixed_4b", "mixed", [192, 96, 208, 16, 48, 64]),
    ("Mixed_4c", "mixed", [160, 112, 224, 24, 64, 64]),
    ("Mixed_4d", "mixed", [128, 128, 256, 24, 64, 64]),
    ("Mixed_4e", "mixed", [112, 144, 288, 32, 64, 64]),
    ("Mixed_4f", "mixed", [256, 160, 320, 32, 128, 128]),
    ("MaxPool3d_5a_2x2", "pool", ((2, 2, 2), (2, 2, 2))),
    ("Mixed_5b", "mixed", [256, 160, 320, 32, 128, 128]),
    ("Mixed_5c", "mixed", [384, 192, 384, 48, 128, 128]),
]

_WEIGHTS_FP = Path(__file__).parent.parent.parent / "resources" / "i3d_rgb_imagenet.npz"


def _conv_same(x, kernel, stride):
    r"""TF-'SAME' 3D conv, NDHWC (HIGHEST precision: metric accuracy over
    speed)."""
    return lax.conv_general_dilated(x, kernel, stride, "SAME",
                                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                                    precision=lax.Precision.HIGHEST)


def _bn_eval(x, p, prefix, eps=1e-3):
    mean = p[f"{prefix}_bn_mean"]
    var = p[f"{prefix}_bn_var"]
    scale = p[f"{prefix}_bn_scale"]
    bias = p[f"{prefix}_bn_bias"]
    return (x - mean) * lax.rsqrt(var + eps) * scale + bias


def _unit3d(x, p, prefix, stride=(1, 1, 1), relu=True, bn=True):
    x = _conv_same(x, p[f"{prefix}_kernel"], stride)
    if f"{prefix}_bias" in p:
        x = x + p[f"{prefix}_bias"]
    if bn:
        x = _bn_eval(x, p, prefix)
    if relu:
        x = jax.nn.relu(x)
    return x


def _maxpool_same(x, kernel, stride):
    import flax.linen as nn
    return nn.max_pool(x, kernel, stride, padding="SAME")


def _mixed(x, p, name):
    b0 = _unit3d(x, p, f"{name}_b0")
    b1 = _unit3d(_unit3d(x, p, f"{name}_b1a"), p, f"{name}_b1b")
    b2 = _unit3d(_unit3d(x, p, f"{name}_b2a"), p, f"{name}_b2b")
    b3 = _unit3d(_maxpool_same(x, (3, 3, 3), (1, 1, 1)), p, f"{name}_b3b")
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_features(x, params, num_classes=400):
    r"""Extracts I3D logits features.

    Args:
        x: [b, t, h, w, c] video, t in [9, 16], spatial 224x224.
        params: parameter dict (see :func:`random_params`).

    Returns: [b, num_classes] features (time-averaged logits, matching the
    reference's ``extract_features`` + squeeze, ``fvd.py:130-135``).
    """
    p = params
    for name, kind, cfg in _I3D_LAYERS:
        if kind == "conv":
            _, _, stride = cfg
            x = _unit3d(x, p, name, stride)
        elif kind == "pool":
            kernel, stride = cfg
            x = _maxpool_same(x, kernel, stride)
        else:
            x = _mixed(x, p, name)
    # avg_pool kernel (2,7,7) stride 1, then 1x1x1 logits conv, mean over time
    x = lax.reduce_window(x, 0.0, lax.add, (1, 2, 7, 7, 1), (1, 1, 1, 1, 1),
                          "VALID") / (2 * 7 * 7)
    x = _conv_same(x, p["logits_kernel"], (1, 1, 1)) + p["logits_bias"]
    x = x.mean(axis=(2, 3))      # squeeze spatial -> [b, t', classes]
    return x.squeeze(1) if x.shape[1] == 1 else x.mean(axis=1)


def _unit_param_shapes(name, in_c, out_c, kernel, bn=True, bias=False):
    shapes = {f"{name}_kernel": (*kernel, in_c, out_c)}
    if bias:
        shapes[f"{name}_bias"] = (out_c,)
    if bn:
        shapes[f"{name}_bn_mean"] = (out_c,)
        shapes[f"{name}_bn_var"] = (out_c,)
        shapes[f"{name}_bn_scale"] = (out_c,)
        shapes[f"{name}_bn_bias"] = (out_c,)
    return shapes


def param_shapes(in_channels=3, num_classes=400):
    r"""All parameter shapes of the I3D network (also drives conversion)."""
    shapes = {}
    c = in_channels
    for name, kind, cfg in _I3D_LAYERS:
        if kind == "conv":
            out_c, kernel, _ = cfg
            shapes.update(_unit_param_shapes(name, c, out_c, kernel))
            c = out_c
        elif kind == "mixed":
            b = cfg
            shapes.update(_unit_param_shapes(f"{name}_b0", c, b[0], (1, 1, 1)))
            shapes.update(_unit_param_shapes(f"{name}_b1a", c, b[1], (1, 1, 1)))
            shapes.update(_unit_param_shapes(f"{name}_b1b", b[1], b[2], (3, 3, 3)))
            shapes.update(_unit_param_shapes(f"{name}_b2a", c, b[3], (1, 1, 1)))
            shapes.update(_unit_param_shapes(f"{name}_b2b", b[3], b[4], (3, 3, 3)))
            shapes.update(_unit_param_shapes(f"{name}_b3b", c, b[5], (1, 1, 1)))
            c = b[0] + b[2] + b[4] + b[5]
    shapes["logits_kernel"] = (1, 1, 1, c, num_classes)
    shapes["logits_bias"] = (num_classes,)
    return shapes


def random_params(seed=0, in_channels=3, num_classes=400):
    rng = np.random.default_rng(seed)
    params = {}
    for name, shape in param_shapes(in_channels, num_classes).items():
        if name.endswith("_bn_var") or name.endswith("_bn_scale"):
            params[name] = np.ones(shape, dtype=np.float32)
        elif name.endswith("_bn_mean") or name.endswith("_bn_bias") or name.endswith("_bias"):
            params[name] = np.zeros(shape, dtype=np.float32)
        else:
            fan_in = int(np.prod(shape[:-1]))
            params[name] = (rng.standard_normal(shape) * np.sqrt(2.0 / fan_in)).astype(np.float32)
    return params


_CACHE = {}


def load_params(in_channels=3):
    r"""Loads converted weights if present, else deterministic random.
    Returns (params, pretrained)."""
    key = ("params", in_channels)
    if key not in _CACHE:
        if _WEIGHTS_FP.exists() and in_channels == 3:
            data = np.load(_WEIGHTS_FP)
            params = {k: jnp.asarray(data[k]) for k in data.files}
            _CACHE[key] = (params, True)
        else:
            params = jax.tree_util.tree_map(jnp.asarray, random_params(in_channels=in_channels))
            _CACHE[key] = (params, False)
    return _CACHE[key]
