r"""On-device image resizing (bilinear, half-pixel centers).

Replaces the reference's torchvision ``Resize`` calls inside models (e.g.
``vp_suite/models/lstm.py:57``, ``model_blocks/enc.py:89,134``) with
``jax.image.resize`` (method='linear' == torch bilinear, align_corners=False).
"""
import jax


def resize_bilinear(x, size):
    r"""Resizes [..., h, w, c] to [..., size[0], size[1], c]."""
    th, tw = (size, size) if isinstance(size, int) else size
    out_shape = (*x.shape[:-3], th, tw, x.shape[-1])
    return jax.image.resize(x, out_shape, method="linear")


def resize_video(x, size):
    r"""Resizes [b, t, h, w, c] videos frame-wise."""
    return resize_bilinear(x, size)
