r"""Impl-match: action-conditional PredRNN-V2 vs. reference
(``vp_suite/models/predrnn_v2.py`` AC path: conv_actions_on_input + reverse
scheduled sampling + residual action convs + AC-ST cells)."""
import jax
import jax.numpy as jnp
import numpy as np

from helpers.ref_loader import load_reference
from helpers.weight_convert import conv_w, convT_w, vec

ATOL = 1e-4


def _convert(ref, num_layers=3):
    params = {}
    for i in range(num_layers):
        cell = ref.cell_list[i]
        for conv_name in ["conv_x", "conv_h", "conv_a", "conv_m", "conv_o"]:
            seq = getattr(cell, conv_name)
            params[f"cell{i}_{conv_name}_kernel"] = conv_w(seq[0].weight)
            if seq[0].bias is not None:
                params[f"cell{i}_{conv_name}_bias"] = vec(seq[0].bias)
        params[f"cell{i}_conv_last_kernel"] = conv_w(cell.conv_last.weight)
        if cell.conv_last.bias is not None:
            params[f"cell{i}_conv_last_bias"] = vec(cell.conv_last.bias)
    params["conv_input1_kernel"] = conv_w(ref.conv_input1.weight)
    params["conv_input2_kernel"] = conv_w(ref.conv_input2.weight)
    params["action_conv_input1_kernel"] = conv_w(ref.action_conv_input1.weight)
    params["action_conv_input2_kernel"] = conv_w(ref.action_conv_input2.weight)
    params["deconv_output1_kernel"] = convT_w(ref.deconv_output1.weight)
    params["deconv_output2_kernel"] = convT_w(ref.deconv_output2.weight)
    params["adapter_kernel"] = conv_w(ref.adapter.weight)
    return {"params": params}


def test_impl():
    import torch
    load_reference()
    from vp_suite.models.predrnn_v2 import PredRNN_V2 as Ref
    from vp_suite_tpu.models import MODEL_CLASSES

    torch.manual_seed(0)
    img, action_size = 32, 3
    kwargs = dict(img_shape=(3, img, img), action_size=action_size,
                  tensor_value_range=(0.0, 1.0), action_conditional=True)
    ref = Ref("cpu", num_hidden=[16, 16, 16, 16], **kwargs)
    ref.eval()
    ours = MODEL_CLASSES["predrnn-pp"](num_hidden=(16, 16, 16, 16), **kwargs)
    params = _convert(ref)

    rng = np.random.default_rng(0)
    ctx, pred = 3, 2
    total = ctx + pred
    x = rng.standard_normal((2, total, img, img, 3)).astype(np.float32)
    actions = rng.standard_normal((2, total, action_size)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        preds_ref, _ = ref(xt, pred_frames=pred, actions=torch.tensor(actions))
    with jax.default_matmul_precision("highest"):
        preds, _ = ours.apply(params, jnp.asarray(x), pred_frames=pred,
                              actions=jnp.asarray(actions))

    diff = np.abs(np.asarray(preds).transpose(0, 1, 4, 2, 3)
                  - preds_ref.detach().numpy()).max()
    assert diff < ATOL, f"AC PredRNN-V2 prediction mismatch: {diff}"
