r"""Impl-match: ACTION-CONDITIONAL ST-Phy vs. reference
(``vp_suite/models/st_phy.py:48-56`` + AC ST-LSTM cell
``model_blocks/predrnn.py:86-160`` + PhyCell action convs): the inflated
action image (linear -> 5x1/1x5 separable convs) modulating the h-gates via
``conv_a``, and the per-cell frame/hidden action convs in the Phy branch."""
import jax
import jax.numpy as jnp
import numpy as np

from helpers.ref_loader import load_reference
from helpers.weight_convert import conv_w, convT_w, linear_w, vec, ln_chw

ATOL = 1e-4


def test_impl():
    import torch
    load_reference()
    from vp_suite.models.st_phy import STPhy as Ref
    from vp_suite_tpu.models import MODEL_CLASSES

    torch.manual_seed(0)
    img, a = 64, 2
    kwargs = dict(img_shape=(3, img, img), action_size=a,
                  tensor_value_range=(0.0, 1.0), action_conditional=True)
    ref = Ref("cpu", **kwargs)
    ref.eval()
    ours = MODEL_CLASSES["st-phy"](**kwargs)

    p = {}
    enc = ref.autoencoder.encoder
    p["ae_enc_conv1_kernel"] = conv_w(enc.conv1.weight)
    p["ae_enc_conv1_bias"] = vec(enc.conv1.bias)
    p["ae_enc_conv2_kernel"] = conv_w(enc.conv2.weight)
    p["ae_enc_conv2_bias"] = vec(enc.conv2.bias)
    p["ae_enc_mean_kernel"] = conv_w(enc.mean_layer.weight)
    p["ae_enc_mean_bias"] = vec(enc.mean_layer.bias)
    dec = ref.autoencoder.decoder
    p["ae_dec_fc1_kernel"] = conv_w(dec.fc1.weight)
    p["ae_dec_fc1_bias"] = vec(dec.fc1.bias)
    p["ae_dec_conv1_kernel"] = convT_w(dec.conv1.weight)
    p["ae_dec_conv1_bias"] = vec(dec.conv1.bias)
    p["ae_dec_conv2_kernel"] = convT_w(dec.conv2.weight)
    p["ae_dec_conv2_bias"] = vec(dec.conv2.bias)
    p["ae_dec_conv3_kernel"] = convT_w(dec.conv3.weight)
    p["ae_dec_conv3_bias"] = vec(dec.conv3.bias)

    for i, cell in enumerate(ref.st_cell_list):
        for cn, key, ln_key in [("conv_x", "conv_x", "ln_x"),
                                ("conv_h", "conv_h", "ln_h"),
                                ("conv_a", "conv_a", "ln_a"),
                                ("conv_m", "conv_m", "ln_m"),
                                ("conv_o", "conv_o", "ln_o")]:
            seq = getattr(cell, cn)
            p[f"st_cell{i}_{key}_kernel"] = conv_w(seq[0].weight)
            if seq[0].bias is not None:
                p[f"st_cell{i}_{key}_bias"] = vec(seq[0].bias)
            p[f"st_cell{i}_{ln_key}_scale"] = ln_chw(seq[1].weight)
            p[f"st_cell{i}_{ln_key}_bias"] = ln_chw(seq[1].bias)
        p[f"st_cell{i}_conv_last_kernel"] = conv_w(cell.conv_last.weight)
        if cell.conv_last.bias is not None:
            p[f"st_cell{i}_conv_last_bias"] = vec(cell.conv_last.bias)
    for i, cell in enumerate(ref.phycell_list):
        p[f"phycell{i}_F_conv1_kernel"] = conv_w(cell.F.conv1.weight)
        p[f"phycell{i}_F_conv1_bias"] = vec(cell.F.conv1.bias)
        p[f"phycell{i}_F_bn1_scale"] = vec(cell.F.bn1.weight)
        p[f"phycell{i}_F_bn1_bias"] = vec(cell.F.bn1.bias)
        p[f"phycell{i}_F_conv2_kernel"] = conv_w(cell.F.conv2.weight)
        p[f"phycell{i}_F_conv2_bias"] = vec(cell.F.conv2.bias)
        p[f"phycell{i}_convgate_kernel"] = conv_w(cell.convgate.weight)
        p[f"phycell{i}_convgate_bias"] = vec(cell.convgate.bias)
        p[f"phycell{i}_frame_action_conv_kernel"] = \
            conv_w(cell.frame_action_conv.weight)
        p[f"phycell{i}_frame_action_conv_bias"] = \
            vec(cell.frame_action_conv.bias)
        p[f"phycell{i}_hidden_action_conv_kernel"] = \
            conv_w(cell.hidden_action_conv.weight)
        p[f"phycell{i}_hidden_action_conv_bias"] = \
            vec(cell.hidden_action_conv.bias)
    for i, conv in enumerate(ref.hidden_conv_list):
        p[f"hidden_conv{i}_kernel"] = conv_w(conv.weight)
        if conv.bias is not None:
            p[f"hidden_conv{i}_bias"] = vec(conv.bias)
    p["adapter_kernel"] = conv_w(ref.adapter.weight)
    p["action_inflate_kernel"] = linear_w(ref.action_inflate.weight)
    p["action_conv_h_kernel"] = conv_w(ref.action_conv_h.weight)
    p["action_conv_w_kernel"] = conv_w(ref.action_conv_w.weight)

    rng = np.random.default_rng(0)
    ctx, pred = 3, 2
    x = rng.random((1, ctx, img, img, 3)).astype(np.float32)
    actions = rng.standard_normal((1, ctx + pred - 1, a)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        preds_ref, _ = ref(xt, pred_frames=pred, actions=torch.tensor(actions))
    with jax.default_matmul_precision("highest"):
        preds, _ = ours.apply({"params": p}, jnp.asarray(x), pred_frames=pred,
                              actions=jnp.asarray(actions))

    diff = np.abs(np.asarray(preds).transpose(0, 1, 4, 2, 3)
                  - preds_ref.detach().numpy()).max()
    assert diff < ATOL, f"action-conditional ST-Phy mismatch: {diff}"
