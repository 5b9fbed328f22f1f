r"""Impl-match: full EF-ConvLSTM model vs. reference
(``vp_suite/models/precipitation_nowcasting/ef_conv_lstm.py``).

Weight mapping: our forecaster stage/rnn index n+1 corresponds to the
reference's ``forecaster.rnn{3-n}`` / ``stage{3-n}`` (the reference reverses
names at construction, ``ef_blocks.py:96-98``).
"""
import jax
import jax.numpy as jnp
import numpy as np

from helpers.ref_loader import load_reference
from helpers.weight_convert import conv_w, convT_w, vec

ATOL = 1e-4


def _convert_rnn(ref_rnn):
    return {
        "conv_kernel": conv_w(ref_rnn._conv.weight),
        "conv_bias": vec(ref_rnn._conv.bias),
        "wci": jnp.asarray(ref_rnn.Wci.detach().numpy()[0].transpose(1, 2, 0)),
        "wcf": jnp.asarray(ref_rnn.Wcf.detach().numpy()[0].transpose(1, 2, 0)),
        "wco": jnp.asarray(ref_rnn.Wco.detach().numpy()[0].transpose(1, 2, 0)),
    }


def _convert_stage(ref_stage):
    r"""Converts a reference _make_layers Sequential into our ConvStage params."""
    out = {}
    for name, layer in ref_stage.named_children():
        import torch.nn as tnn
        if isinstance(layer, tnn.Conv2d):
            out[name] = {"kernel": conv_w(layer.weight), "bias": vec(layer.bias)}
        elif isinstance(layer, tnn.ConvTranspose2d):
            out[name] = {"kernel": convT_w(layer.weight), "bias": vec(layer.bias)}
    return out


def test_impl():
    import torch
    load_reference()
    from vp_suite.models.precipitation_nowcasting.ef_conv_lstm import EF_ConvLSTM as Ref
    from vp_suite_tpu.models import MODEL_CLASSES

    torch.manual_seed(0)
    img = 32
    ref = Ref("cpu", img_shape=(3, img, img), action_size=0,
              tensor_value_range=(0.0, 1.0))
    ref.eval()

    ours = MODEL_CLASSES["convlstm-shi"](img_shape=(3, img, img), action_size=0,
                                         tensor_value_range=(0.0, 1.0))
    params = {}
    for n in range(3):
        params[f"enc_rnn{n+1}"] = _convert_rnn(getattr(ref.encoder, f"rnn{n+1}"))
        params[f"enc_stage{n+1}"] = _convert_stage(getattr(ref.encoder, f"stage{n+1}"))
        params[f"dec_rnn{n+1}"] = _convert_rnn(getattr(ref.forecaster, f"rnn{3-n}"))
        params[f"dec_stage{n+1}"] = _convert_stage(getattr(ref.forecaster, f"stage{3-n}"))
    params = {"params": params}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, img, img, 3)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        preds_ref, _ = ref(xt, pred_frames=3)
    with jax.default_matmul_precision("highest"):
        preds, _ = ours.apply(params, jnp.asarray(x), pred_frames=3)

    diff = np.abs(np.asarray(preds).transpose(0, 1, 4, 2, 3)
                  - preds_ref.detach().numpy()).max()
    assert diff < ATOL, f"EF-ConvLSTM prediction mismatch: {diff}"
