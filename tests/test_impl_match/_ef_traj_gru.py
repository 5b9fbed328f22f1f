r"""Impl-match: full EF-TrajGRU model vs. reference
(``vp_suite/models/precipitation_nowcasting/ef_traj_gru.py``)."""
import jax
import jax.numpy as jnp
import numpy as np

from helpers.ref_loader import load_reference
from helpers.weight_convert import conv_w, convT_w, vec

ATOL = 1e-4


def _convert_rnn(ref_rnn):
    return {
        "i2h_kernel": conv_w(ref_rnn.i2h.weight), "i2h_bias": vec(ref_rnn.i2h.bias),
        "i2f_conv1_kernel": conv_w(ref_rnn.i2f_conv1.weight),
        "i2f_conv1_bias": vec(ref_rnn.i2f_conv1.bias),
        "h2f_conv1_kernel": conv_w(ref_rnn.h2f_conv1.weight),
        "h2f_conv1_bias": vec(ref_rnn.h2f_conv1.bias),
        "flows_conv_kernel": conv_w(ref_rnn.flows_conv.weight),
        "flows_conv_bias": vec(ref_rnn.flows_conv.bias),
        "ret_kernel": conv_w(ref_rnn.ret.weight), "ret_bias": vec(ref_rnn.ret.bias),
    }


def _convert_stage(ref_stage):
    out = {}
    import torch.nn as tnn
    for name, layer in ref_stage.named_children():
        if isinstance(layer, tnn.Conv2d):
            out[name] = {"kernel": conv_w(layer.weight), "bias": vec(layer.bias)}
        elif isinstance(layer, tnn.ConvTranspose2d):
            out[name] = {"kernel": convT_w(layer.weight), "bias": vec(layer.bias)}
    return out


def test_impl():
    import torch
    load_reference()
    from vp_suite.models.precipitation_nowcasting.ef_traj_gru import EF_TrajGRU as Ref
    from vp_suite_tpu.models import MODEL_CLASSES

    torch.manual_seed(0)
    img = 32
    ref = Ref("cpu", img_shape=(3, img, img), action_size=0,
              tensor_value_range=(0.0, 1.0))
    ref.eval()

    ours = MODEL_CLASSES["trajgru"](img_shape=(3, img, img), action_size=0,
                                    tensor_value_range=(0.0, 1.0))
    params = {}
    for n in range(3):
        params[f"enc_rnn{n+1}"] = _convert_rnn(getattr(ref.encoder, f"rnn{n+1}"))
        params[f"enc_stage{n+1}"] = _convert_stage(getattr(ref.encoder, f"stage{n+1}"))
        params[f"dec_rnn{n+1}"] = _convert_rnn(getattr(ref.forecaster, f"rnn{3-n}"))
        params[f"dec_stage{n+1}"] = _convert_stage(getattr(ref.forecaster, f"stage{3-n}"))
    params = {"params": params}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, img, img, 3)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        preds_ref, _ = ref(xt, pred_frames=2)
    with jax.default_matmul_precision("highest"):
        preds, _ = ours.apply(params, jnp.asarray(x), pred_frames=2)

    diff = np.abs(np.asarray(preds).transpose(0, 1, 4, 2, 3)
                  - preds_ref.detach().numpy()).max()
    assert diff < ATOL, f"EF-TrajGRU prediction mismatch: {diff}"
