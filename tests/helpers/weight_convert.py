r"""PyTorch → JAX weight-layout converters for the impl-match tests.

Layout rules (see ``vp_suite_tpu/nn/layers.py`` docstring):
- conv:   torch [out, in, kh, kw]      -> ours [kh, kw, in, out]
- convT:  torch [in, out, kh, kw]      -> ours [kh, kw, in, out]
- conv3d: torch [out, in, kt, kh, kw]  -> ours [kt, kh, kw, in, out]
- linear: torch [out, in]              -> ours [in, out]
- LayerNorm([c, h, w]) affine          -> ours [h, w, c]
"""
import jax.numpy as jnp
import numpy as np


def t(x):
    return np.asarray(x.detach().cpu().numpy())


def conv_w(p):
    return jnp.asarray(t(p).transpose(2, 3, 1, 0))


def convT_w(p):
    return jnp.asarray(t(p).transpose(2, 3, 0, 1))


def conv3d_w(p):
    return jnp.asarray(t(p).transpose(2, 3, 4, 1, 0))


def linear_w(p):
    return jnp.asarray(t(p).transpose(1, 0))


def vec(p):
    return jnp.asarray(t(p))


def ln_chw(p):
    return jnp.asarray(t(p).transpose(1, 2, 0))


def nchw_to_nhwc(x):
    return np.asarray(x).transpose(0, 2, 3, 1)


def nthwc_from_torch(x):
    r"""[b, t, c, h, w] -> [b, t, h, w, c]"""
    return np.asarray(x).transpose(0, 1, 3, 4, 2)


def to_torch_video(x_nthwc):
    r"""numpy [b, t, h, w, c] -> torch [b, t, c, h, w]"""
    import torch
    return torch.tensor(np.asarray(x_nthwc).transpose(0, 1, 4, 2, 3))
