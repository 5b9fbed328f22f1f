r"""Impl-match: multi-layer ConvLSTM (ndrplz) block vs. reference
(``vp_suite/model_blocks/conv_lstm_ndrplz.py``)."""
import jax
import jax.numpy as jnp
import numpy as np

from helpers.ref_loader import load_reference
from helpers.weight_convert import conv_w, vec

ATOL = 1e-4


def test_impl():
    import torch
    load_reference()
    from vp_suite.model_blocks.conv_lstm_ndrplz import ConvLSTM as RefConvLSTM
    from vp_suite_tpu.model_blocks import ConvLSTMNdrplz

    rng = np.random.default_rng(1)
    b, seq, h, w, cin = 2, 4, 8, 8, 3
    hidden = [5, 6]
    x = rng.standard_normal((seq, b, h, w, cin)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 1, 4, 2, 3)  # [t, b, c, h, w]

    torch.manual_seed(1)
    ref = RefConvLSTM(input_dim=cin, hidden_dim=hidden, kernel_size=(3, 3),
                      num_layers=2, batch_first=False, return_all_layers=True)
    layer_out_ref, states_ref = ref(xt)

    ours = ConvLSTMNdrplz(input_dim=cin, hidden_dim=hidden, kernel_size=(3, 3),
                          num_layers=2, batch_first=False, return_all_layers=True)
    params = {"params": {}}
    for li in range(2):
        cell = ref.cell_list[li]
        params["params"][f"cell{li}_conv_kernel"] = conv_w(cell.conv.weight)
        params["params"][f"cell{li}_conv_bias"] = vec(cell.conv.bias)

    with jax.default_matmul_precision("highest"):
        layer_out, states = ours.apply(params, jnp.asarray(x))

    for lo, lo_ref in zip(layer_out, layer_out_ref):
        assert np.allclose(np.asarray(lo).transpose(0, 1, 4, 2, 3),
                           lo_ref.detach().numpy(), atol=ATOL)
    for (h_o, c_o), (h_r, c_r) in zip(states, states_ref):
        assert np.allclose(np.asarray(h_o).transpose(0, 3, 1, 2),
                           h_r.detach().numpy(), atol=ATOL)
        assert np.allclose(np.asarray(c_o).transpose(0, 3, 1, 2),
                           c_r.detach().numpy(), atol=ATOL)
