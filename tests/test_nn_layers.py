r"""PyTorch arithmetic-parity tests for the NN layer library.

These guard the foundation of the impl-match tier: conv / transposed-conv /
norm layers must match torch within 1e-4 on CPU at highest precision.
Skipped when torch is unavailable.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vp_suite_tpu.nn import (Conv2d, ConvTranspose2d, Conv3d, GroupNorm,
                             LayerNormCHW, Dense)

ATOL = 1e-4
RNG = np.random.default_rng(0)


def _x(shape):
    return RNG.standard_normal(shape).astype(np.float32)


def test_conv2d_matches_torch():
    x = _x((2, 13, 17, 5))
    tconv = torch.nn.Conv2d(5, 7, 3, stride=2, padding=1)
    m = Conv2d(features=7, kernel_size=3, strides=2, padding=1)
    p = {"params": {"kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0)),
                    "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(m.apply(p, jnp.asarray(x)))
    theirs = tconv(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy().transpose(0, 2, 3, 1)
    assert np.abs(ours - theirs).max() < ATOL


def test_conv2d_replicate_padding_matches_torch():
    x = _x((2, 9, 9, 4))
    tconv = torch.nn.Conv2d(4, 6, 3, padding=1, padding_mode="replicate")
    m = Conv2d(features=6, kernel_size=3, padding=1, padding_mode="replicate")
    p = {"params": {"kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 1, 0)),
                    "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(m.apply(p, jnp.asarray(x)))
    theirs = tconv(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy().transpose(0, 2, 3, 1)
    assert np.abs(ours - theirs).max() < ATOL


@pytest.mark.parametrize("k,s,p,op", [(4, 2, 1, 0), (3, 2, 1, 1), (3, 1, 1, 0),
                                      (6, 2, 0, 0), (5, 1, 0, 0)])
def test_conv_transpose2d_matches_torch(k, s, p, op):
    x = _x((2, 13, 17, 5))
    tct = torch.nn.ConvTranspose2d(5, 7, k, stride=s, padding=p, output_padding=op)
    m = ConvTranspose2d(features=7, kernel_size=k, strides=s, padding=p,
                        output_padding=op)
    pp = {"params": {"kernel": jnp.asarray(tct.weight.detach().numpy().transpose(2, 3, 0, 1)),
                     "bias": jnp.asarray(tct.bias.detach().numpy())}}
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(m.apply(pp, jnp.asarray(x)))
    theirs = tct(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy().transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape
    assert np.abs(ours - theirs).max() < ATOL


def test_conv3d_matches_torch():
    x = _x((2, 4, 9, 9, 5))
    tc3 = torch.nn.Conv3d(5, 6, 3, padding=1)
    m = Conv3d(features=6, kernel_size=3, padding=1)
    p = {"params": {"kernel": jnp.asarray(tc3.weight.detach().numpy().transpose(2, 3, 4, 1, 0)),
                    "bias": jnp.asarray(tc3.bias.detach().numpy())}}
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(m.apply(p, jnp.asarray(x)))
    theirs = tc3(torch.tensor(x).permute(0, 4, 1, 2, 3)).detach().numpy() \
        .transpose(0, 2, 3, 4, 1)
    assert np.abs(ours - theirs).max() < ATOL


def test_group_norm_matches_torch():
    x = _x((2, 6, 6, 8))
    tgn = torch.nn.GroupNorm(4, 8)
    with torch.no_grad():
        tgn.weight.uniform_(-1, 1)
        tgn.bias.uniform_(-1, 1)
    m = GroupNorm(num_groups=4)
    p = {"params": {"scale": jnp.asarray(tgn.weight.detach().numpy()),
                    "bias": jnp.asarray(tgn.bias.detach().numpy())}}
    ours = np.asarray(m.apply(p, jnp.asarray(x)))
    theirs = tgn(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy().transpose(0, 2, 3, 1)
    assert np.abs(ours - theirs).max() < ATOL


def test_layer_norm_chw_matches_torch():
    x = _x((2, 6, 6, 8))
    tln = torch.nn.LayerNorm([8, 6, 6])
    with torch.no_grad():
        tln.weight.uniform_(-1, 1)
        tln.bias.uniform_(-1, 1)
    m = LayerNormCHW(feature_shape=(6, 6, 8))
    p = {"params": {"scale": jnp.asarray(tln.weight.detach().numpy().transpose(1, 2, 0)),
                    "bias": jnp.asarray(tln.bias.detach().numpy().transpose(1, 2, 0))}}
    ours = np.asarray(m.apply(p, jnp.asarray(x)))
    theirs = tln(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy().transpose(0, 2, 3, 1)
    assert np.abs(ours - theirs).max() < ATOL


def test_grid_sample_matches_torch():
    from vp_suite_tpu.ops.grid_sample import grid_sample
    img = _x((2, 7, 9, 3))
    grid = (RNG.random((2, 5, 6, 2)).astype(np.float32) * 2.4 - 1.2)  # incl. OOB
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    theirs = torch.nn.functional.grid_sample(
        torch.tensor(img).permute(0, 3, 1, 2), torch.tensor(grid),
        align_corners=False).detach().numpy().transpose(0, 2, 3, 1)
    assert np.abs(ours - theirs).max() < ATOL


def test_warp_flow_multi_matches_per_flow_warp():
    r"""The matmul-form multi-warp must equal per-flow gather warps (which
    are themselves torch-parity-tested via grid_sample above)."""
    from vp_suite_tpu.ops.grid_sample import warp_flow, warp_flow_multi
    import jax
    L = 5
    img = jnp.asarray(_x((2, 11, 13, 4)))
    flows = jnp.asarray(RNG.random((2, 11, 13, 2 * L)).astype(np.float32) * 10 - 5)
    ref = jnp.concatenate([warp_flow(img, flows[..., 2 * j:2 * j + 2])
                           for j in range(L)], axis=-1)
    with jax.default_matmul_precision("highest"):
        got = warp_flow_multi(img, flows)
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < ATOL


def test_resize_matches_torch_interpolate():
    from vp_suite_tpu.ops.image import resize_bilinear
    img = _x((2, 8, 8, 3))
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (15, 11)))
    theirs = torch.nn.functional.interpolate(
        torch.tensor(img).permute(0, 3, 1, 2), size=(15, 11), mode="bilinear",
        align_corners=False).detach().numpy().transpose(0, 2, 3, 1)
    assert np.abs(ours - theirs).max() < 1e-3


def test_lstm_cell_matches_torch():
    from vp_suite_tpu.models.lstm import _lstm_cell_step
    cell = torch.nn.LSTMCell(6, 5)
    x = _x((3, 6))
    h = _x((3, 5))
    c = _x((3, 5))
    ht, ct = cell(torch.tensor(x), (torch.tensor(h), torch.tensor(c)))
    with jax.default_matmul_precision("highest"):
        ho, co = _lstm_cell_step(
            jnp.asarray(x), jnp.asarray(h), jnp.asarray(c),
            jnp.asarray(cell.weight_ih.detach().numpy().T),
            jnp.asarray(cell.bias_ih.detach().numpy()),
            jnp.asarray(cell.weight_hh.detach().numpy().T),
            jnp.asarray(cell.bias_hh.detach().numpy()))
    assert np.abs(np.asarray(ho) - ht.detach().numpy()).max() < ATOL
    assert np.abs(np.asarray(co) - ct.detach().numpy()).max() < ATOL
