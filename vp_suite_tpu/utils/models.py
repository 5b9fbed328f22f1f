r"""Model utilities: conv shape arithmetic, value-range adapters, param-tree
comparison.

Capability parity with ``vp_suite/utils/models.py:7-193``; adapters are pure
jittable functions instead of nn.Modules.
"""
import numpy as np


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def conv_output_shape(hw, kernel_size=1, stride=1, pad=0, dilation=1):
    r"""Output (h, w) of a conv layer (parity: ``utils/models.py:131-160``)."""
    h, w = _pair(hw)
    k = _pair(kernel_size)
    s = _pair(stride)
    p = _pair(pad)
    d = _pair(dilation)
    oh = (h + 2 * p[0] - d[0] * (k[0] - 1) - 1) // s[0] + 1
    ow = (w + 2 * p[1] - d[1] * (k[1] - 1) - 1) // s[1] + 1
    return oh, ow


def convtransp_output_shape(hw, kernel_size=1, stride=1, pad=0, dilation=1, out_pad=0):
    r"""Output (h, w) of a transposed conv layer
    (parity: ``utils/models.py:163-193``)."""
    h, w = _pair(hw)
    k = _pair(kernel_size)
    s = _pair(stride)
    p = _pair(pad)
    d = _pair(dilation)
    op = _pair(out_pad)
    oh = (h - 1) * s[0] - 2 * p[0] + d[0] * (k[0] - 1) + op[0] + 1
    ow = (w - 1) * s[1] - 2 * p[1] + d[1] * (k[1] - 1) + op[1] + 1
    return oh, ow


class ScaleToTest:
    r"""Maps model-range outputs to test-range (parity:
    ``utils/models.py:7-34``). Pure callable usable inside jit."""

    def __init__(self, model_value_range, test_value_range):
        self.m_min, self.m_max = model_value_range
        self.t_min, self.t_max = test_value_range

    def __call__(self, img):
        img = (img - self.m_min) / (self.m_max - self.m_min)
        return img * (self.t_max - self.t_min) + self.t_min


class ScaleToModel:
    r"""Maps test-range inputs to model-range (parity:
    ``utils/models.py:37-64``)."""

    def __init__(self, model_value_range, test_value_range):
        self.m_min, self.m_max = model_value_range
        self.t_min, self.t_max = test_value_range

    def __call__(self, img):
        img = (img - self.t_min) / (self.t_max - self.t_min)
        return img * (self.m_max - self.m_min) + self.m_min


def param_trees_equal(tree_a, tree_b, check_values: bool = True, atol: float = 1e-6):
    r"""Structural (and optionally value) equality of two param pytrees
    (analog of the reference's ``state_dicts_equal``,
    ``utils/models.py:67-128``)."""
    import jax
    flat_a = jax.tree_util.tree_leaves_with_path(tree_a)
    flat_b = jax.tree_util.tree_leaves_with_path(tree_b)
    if len(flat_a) != len(flat_b):
        return False
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        if pa != pb:
            return False
        if np.asarray(va).shape != np.asarray(vb).shape:
            return False
        if check_values and not np.allclose(np.asarray(va), np.asarray(vb), atol=atol):
            return False
    return True
