r"""Impl-match: full PredRNN-V2 model (non-action-conditional) vs. reference
(``vp_suite/models/predrnn_v2.py``), with and without layer norm — the
reference's own impl-match covers 8 architecture configs
(``tests/test_impl_match/_predrnn_v2.py:84-97``); the non-AC pair is the
supported one here (AC mode requires actions plumbing in both)."""
import jax
import jax.numpy as jnp
import numpy as np

from helpers.ref_loader import load_reference
from helpers.weight_convert import conv_w, vec, ln_chw

ATOL = 1e-4


def _convert(ref, layer_norm, num_layers=3):
    params = {}
    for i in range(num_layers):
        cell = ref.cell_list[i]
        for conv_name in ["conv_x", "conv_h", "conv_m", "conv_o"]:
            seq = getattr(cell, conv_name)
            params[f"cell{i}_{conv_name}_kernel"] = conv_w(seq[0].weight)
            if layer_norm:
                ln = seq[1]
                key = {"conv_x": "ln_x", "conv_h": "ln_h", "conv_m": "ln_m",
                       "conv_o": "ln_o"}[conv_name]
                params[f"cell{i}_{key}_scale"] = ln_chw(ln.weight)
                params[f"cell{i}_{key}_bias"] = ln_chw(ln.bias)
        params[f"cell{i}_conv_last_kernel"] = conv_w(cell.conv_last.weight)
    params["conv_last_kernel"] = conv_w(ref.conv_last.weight)
    params["adapter_kernel"] = conv_w(ref.adapter.weight)
    return {"params": params}


def _check_one(layer_norm):
    import torch
    from vp_suite.models.predrnn_v2 import PredRNN_V2 as Ref
    from vp_suite_tpu.models import MODEL_CLASSES

    torch.manual_seed(0)
    img = 16
    kwargs = dict(img_shape=(3, img, img), action_size=0,
                  tensor_value_range=(0.0, 1.0))
    ref = Ref("cpu", layer_norm=layer_norm, num_hidden=[32, 32, 32, 32], **kwargs)
    ref.eval()
    ours = MODEL_CLASSES["predrnn-pp"](layer_norm=layer_norm,
                                       num_hidden=(32, 32, 32, 32), **kwargs)
    params = _convert(ref, layer_norm)

    rng = np.random.default_rng(0)
    ctx, pred = 3, 2
    x = rng.standard_normal((2, ctx + pred, img, img, 3)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        preds_ref, aux_ref = ref(xt, pred_frames=pred)
    with jax.default_matmul_precision("highest"):
        preds, aux = ours.apply(params, jnp.asarray(x), pred_frames=pred)

    diff = np.abs(np.asarray(preds).transpose(0, 1, 4, 2, 3)
                  - preds_ref.detach().numpy()).max()
    assert diff < ATOL, f"PredRNN-V2 (layer_norm={layer_norm}) mismatch: {diff}"
    dl_ref = float(aux_ref["ST-LSTM decouple loss"])
    dl = float(aux["ST-LSTM decouple loss"])
    assert abs(dl - dl_ref) < 1e-3, f"decouple loss mismatch: {dl} vs {dl_ref}"


def test_impl():
    load_reference()
    _check_one(layer_norm=False)
    _check_one(layer_norm=True)
