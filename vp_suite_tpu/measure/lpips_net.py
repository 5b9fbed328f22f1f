r"""LPIPS network (AlexNet backbone + linear calibration heads) in JAX.

TPU-native replacement for the reference's ``piqa.lpips`` dependency
(``vp_suite/measure/image_wise.py:78-96``). The architecture matches the
original LPIPS AlexNet variant (Zhang et al., arxiv 1801.03924):

1. input in [0, 1] → [-1, 1] → per-channel shift/scale normalization,
2. AlexNet conv stack, features tapped after each of the 5 ReLUs,
3. channel-wise unit normalization of each feature map,
4. squared differences → per-layer 1x1 'linear' weighting → spatial mean,
5. sum over layers.

Weights: if a converted checkpoint exists at
``resources/lpips_alexnet.npz`` (produced by
``vp_suite_tpu.measure.convert_weights``), it is used. Otherwise the net
falls back to deterministic random features (seed 0) — this environment has
no network egress to fetch pretrained weights; random-feature LPIPS remains a
meaningful perceptual-style distance but is flagged via ``pretrained=False``.
"""
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_ALEX_CFG = [
    # (out_c, kernel, stride, pad, maxpool_before)
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]

_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

_WEIGHTS_FP = Path(__file__).parent.parent / "resources" / "lpips_alexnet.npz"


def _random_params(seed=0):
    r"""Deterministic random AlexNet + uniform linear heads."""
    rng = np.random.default_rng(seed)
    params = {}
    in_c = 3
    for i, (out_c, k, s, p, _) in enumerate(_ALEX_CFG):
        fan_in = in_c * k * k
        std = float(np.sqrt(2.0 / fan_in))
        params[f"conv{i}_kernel"] = rng.standard_normal((k, k, in_c, out_c)).astype(np.float32) * std
        params[f"conv{i}_bias"] = np.zeros((out_c,), dtype=np.float32)
        params[f"lin{i}"] = np.full((out_c,), 1.0 / out_c, dtype=np.float32)
        in_c = out_c
    return params, False


def _load_params():
    if _WEIGHTS_FP.exists():
        data = np.load(_WEIGHTS_FP)
        return {k: data[k] for k in data.files}, True
    return _random_params()


_CACHE = {}


class LPIPSNet:
    r"""Callable LPIPS distance on [n, h, w, c] images in [0, 1]."""

    def __init__(self):
        if "params" not in _CACHE:
            params, pretrained = _load_params()
            _CACHE["params"] = jax.tree_util.tree_map(jnp.asarray, params)
            _CACHE["pretrained"] = pretrained
        self.params = _CACHE["params"]
        self.pretrained = _CACHE["pretrained"]

    def features(self, x):
        r"""x in [0,1], [n, h, w, 3] → list of 5 feature maps."""
        x = 2.0 * x - 1.0
        x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        feats = []
        for i, (out_c, k, s, p, pool_before) in enumerate(_ALEX_CFG):
            if pool_before:
                import flax.linen as nn
                x = nn.max_pool(x, (3, 3), (2, 2), padding=[(0, 0), (0, 0)])
            kern = self.params[f"conv{i}_kernel"]
            bias = self.params[f"conv{i}_bias"]
            x = lax.conv_general_dilated(x, kern, (s, s), [(p, p), (p, p)],
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                         precision=lax.Precision.HIGHEST)
            x = jax.nn.relu(x + bias)
            feats.append(x)
        return feats

    def per_image(self, pred, target):
        r"""Per-image LPIPS distances [n]."""
        fp = self.features(pred)
        ft = self.features(target)
        total = 0.0
        for i, (a, b) in enumerate(zip(fp, ft)):
            na = a * lax.rsqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            nb = b * lax.rsqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            lin = jnp.maximum(self.params[f"lin{i}"], 0.0)
            total = total + (d * lin).sum(axis=-1).mean(axis=(1, 2))
        return total

    def __call__(self, pred, target):
        return self.per_image(pred, target).mean()
