r"""Impl-match: PhyDNet building blocks vs. reference
(``vp_suite/model_blocks/phydnet.py``): PhyCell_Cell step math and the K2M
kernel→moment transform (which drives the moment-regularization loss)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from helpers.ref_loader import load_reference
from helpers.weight_convert import conv_w, vec

ATOL = 1e-4


class _CellHarness(nn.Module):
    r"""Wraps the PhyCell factory into a callable module for testing."""
    input_dim: int
    hidden_dim: int
    kernel_size: tuple

    @nn.compact
    def __call__(self, frame, hidden):
        from vp_suite_tpu.model_blocks.phydnet import make_phycell_cell
        step = make_phycell_cell(self, "cell", self.input_dim, False, 0,
                                 self.hidden_dim, self.kernel_size)
        return step(frame, None, hidden)


def test_impl():
    import torch
    load_reference()
    from vp_suite.model_blocks.phydnet import PhyCell_Cell as RefCell, K2M as RefK2M
    from vp_suite_tpu.model_blocks.phydnet import k2m, k2m_matrices

    # --- PhyCell_Cell step ---
    torch.manual_seed(0)
    input_dim, hidden_dim, ks = 8, 9, (7, 7)
    ref = RefCell(input_dim=input_dim, action_conditional=False, action_size=0,
                  hidden_dim=hidden_dim, kernel_size=ks)
    ours = _CellHarness(input_dim=input_dim, hidden_dim=hidden_dim, kernel_size=ks)
    params = {"params": {
        "cell_F_conv1_kernel": conv_w(ref.F.conv1.weight),
        "cell_F_conv1_bias": vec(ref.F.conv1.bias),
        "cell_F_bn1_scale": vec(ref.F.bn1.weight),
        "cell_F_bn1_bias": vec(ref.F.bn1.bias),
        "cell_F_conv2_kernel": conv_w(ref.F.conv2.weight),
        "cell_F_conv2_bias": vec(ref.F.conv2.bias),
        "cell_convgate_kernel": conv_w(ref.convgate.weight),
        "cell_convgate_bias": vec(ref.convgate.bias),
    }}
    rng = np.random.default_rng(0)
    frame = rng.standard_normal((2, 12, 12, input_dim)).astype(np.float32)
    hidden = rng.standard_normal((2, 12, 12, input_dim)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(frame).permute(0, 3, 1, 2), None,
                      torch.tensor(hidden).permute(0, 3, 1, 2))
    with jax.default_matmul_precision("highest"):
        out = ours.apply(params, jnp.asarray(frame), jnp.asarray(hidden))
    diff = np.abs(np.asarray(out).transpose(0, 3, 1, 2)
                  - out_ref.detach().numpy()).max()
    assert diff < ATOL, f"PhyCell_Cell mismatch: {diff}"

    # --- K2M ---
    ref_k2m = RefK2M([7, 7])
    kern = rng.standard_normal((49, 7, 7))
    m_ref = ref_k2m(torch.tensor(kern)).numpy()
    m_ours = np.asarray(k2m(jnp.asarray(kern, jnp.float32), k2m_matrices((7, 7))))
    assert np.abs(m_ours - m_ref).max() < 1e-2, \
        f"K2M mismatch: {np.abs(m_ours - m_ref).max()}"
