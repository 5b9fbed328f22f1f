r"""Impl-match: ConvLSTM (Shi/Hzzone) block vs. reference
(``vp_suite/model_blocks/conv_lstm_hzzone.py``)."""
import jax
import jax.numpy as jnp
import numpy as np

from helpers.ref_loader import load_reference
from helpers.weight_convert import conv_w, vec

ATOL = 1e-4


def test_impl():
    import torch
    load_reference()
    from vp_suite.model_blocks.conv_lstm_hzzone import ConvLSTM as RefConvLSTM
    from vp_suite_tpu.model_blocks import ConvLSTMShi

    rng = np.random.default_rng(0)
    b, seq, h, w, cin, cenc = 2, 4, 8, 8, 5, 6
    x = rng.standard_normal((b, seq, h, w, cin)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 1, 4, 2, 3)

    torch.manual_seed(0)
    ref = RefConvLSTM("cpu", cin, cenc, h, w, kernel_size=3, stride=1, padding=1)
    with torch.no_grad():
        ref.Wci.uniform_(-0.5, 0.5)
        ref.Wcf.uniform_(-0.5, 0.5)
        ref.Wco.uniform_(-0.5, 0.5)
    out_ref, (h_ref, c_ref) = ref(xt, None, seq)

    ours = ConvLSTMShi(in_channels=cin, enc_channels=cenc, state_h=h, state_w=w,
                       kernel_size=3)
    params = {"params": {
        "conv_kernel": conv_w(ref._conv.weight),
        "conv_bias": vec(ref._conv.bias),
        "wci": jnp.asarray(ref.Wci.detach().numpy()[0].transpose(1, 2, 0)),
        "wcf": jnp.asarray(ref.Wcf.detach().numpy()[0].transpose(1, 2, 0)),
        "wco": jnp.asarray(ref.Wco.detach().numpy()[0].transpose(1, 2, 0)),
    }}
    with jax.default_matmul_precision("highest"):
        out, (hh, cc) = ours.apply(params, jnp.asarray(x), None, seq)
        out_dec, _ = ours.apply(params, None, (hh, cc), 3)

    assert np.allclose(np.asarray(out).transpose(0, 1, 4, 2, 3),
                       out_ref.detach().numpy(), atol=ATOL)
    out_ref_dec, _ = ref(None, (h_ref, c_ref), 3)
    assert np.allclose(np.asarray(out_dec).transpose(0, 1, 4, 2, 3),
                       out_ref_dec.detach().numpy(), atol=ATOL)
