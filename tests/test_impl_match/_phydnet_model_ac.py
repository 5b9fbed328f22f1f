r"""Impl-match: ACTION-CONDITIONAL PhyDNet vs. reference
(``vp_suite/models/phydnet.py`` + ``model_blocks/phydnet.py:43-55,152-156``):
per-cell frame/hidden action convs in the PhyCell stack and channel-inflated
actions into the ConvLSTM branch, with the reference's sequential
``ac_index`` action feed."""
import jax
import jax.numpy as jnp
import numpy as np

from helpers.ref_loader import load_reference
from helpers.weight_convert import conv_w, convT_w, vec

ATOL = 1e-4


def _dcgan_conv(params, name, main):
    params[f"{name}_conv_kernel"] = conv_w(main[0].weight)
    params[f"{name}_conv_bias"] = vec(main[0].bias)
    params[f"{name}_gn_scale"] = vec(main[1].weight)
    params[f"{name}_gn_bias"] = vec(main[1].bias)


def _dcgan_convT(params, name, main):
    params[f"{name}_conv_kernel"] = convT_w(main[0].weight)
    params[f"{name}_conv_bias"] = vec(main[0].bias)
    params[f"{name}_gn_scale"] = vec(main[1].weight)
    params[f"{name}_gn_bias"] = vec(main[1].bias)


def test_impl():
    import torch
    load_reference()
    from vp_suite.models.phydnet import PhyDNet as Ref
    from vp_suite_tpu.models import MODEL_CLASSES

    torch.manual_seed(0)
    img, a = 64, 2
    kwargs = dict(img_shape=(1, img, img), action_size=a,
                  tensor_value_range=(0.0, 1.0), action_conditional=True)
    ref = Ref("cpu", **kwargs)
    ref.eval()
    ours = MODEL_CLASSES["phy"](**kwargs)

    p = {}
    for i, name in enumerate(["c1", "c2", "c3"]):
        _dcgan_conv(p, f"encoder_E_{name}", getattr(ref.encoder_E, name).main)
    for enc, pref in [(ref.encoder_Ep, "encoder_Ep"), (ref.encoder_Er, "encoder_Er")]:
        _dcgan_conv(p, f"{pref}_c1", enc.c1.main)
        _dcgan_conv(p, f"{pref}_c2", enc.c2.main)
    for dec, pref in [(ref.decoder_Dp, "decoder_Dp"), (ref.decoder_Dr, "decoder_Dr")]:
        _dcgan_convT(p, f"{pref}_upc1", dec.upc1.main)
        _dcgan_convT(p, f"{pref}_upc2", dec.upc2.main)
    _dcgan_convT(p, "decoder_D_upc1", ref.decoder_D.upc1.main)
    _dcgan_convT(p, "decoder_D_upc2", ref.decoder_D.upc2.main)
    p["decoder_D_upc3_kernel"] = convT_w(ref.decoder_D.upc3.weight)
    p["decoder_D_upc3_bias"] = vec(ref.decoder_D.upc3.bias)

    for j, cell in enumerate(ref.phycell.cell_list):
        p[f"phycell{j}_F_conv1_kernel"] = conv_w(cell.F.conv1.weight)
        p[f"phycell{j}_F_conv1_bias"] = vec(cell.F.conv1.bias)
        p[f"phycell{j}_F_bn1_scale"] = vec(cell.F.bn1.weight)
        p[f"phycell{j}_F_bn1_bias"] = vec(cell.F.bn1.bias)
        p[f"phycell{j}_F_conv2_kernel"] = conv_w(cell.F.conv2.weight)
        p[f"phycell{j}_F_conv2_bias"] = vec(cell.F.conv2.bias)
        p[f"phycell{j}_convgate_kernel"] = conv_w(cell.convgate.weight)
        p[f"phycell{j}_convgate_bias"] = vec(cell.convgate.bias)
        p[f"phycell{j}_frame_action_conv_kernel"] = \
            conv_w(cell.frame_action_conv.weight)
        p[f"phycell{j}_frame_action_conv_bias"] = \
            vec(cell.frame_action_conv.bias)
        p[f"phycell{j}_hidden_action_conv_kernel"] = \
            conv_w(cell.hidden_action_conv.weight)
        p[f"phycell{j}_hidden_action_conv_bias"] = \
            vec(cell.hidden_action_conv.bias)
    for j, cell in enumerate(ref.convcell.cell_list):
        p[f"convcell{j}_conv_kernel"] = conv_w(cell.conv.weight)
        p[f"convcell{j}_conv_bias"] = vec(cell.conv.bias)

    rng = np.random.default_rng(0)
    ctx, pred = 3, 2
    x = rng.random((2, ctx, img, img, 1)).astype(np.float32)
    actions = rng.standard_normal((2, ctx + pred - 1, a)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        preds_ref, _ = ref(xt, pred_frames=pred, actions=torch.tensor(actions))
    with jax.default_matmul_precision("highest"):
        preds, _ = ours.apply({"params": p}, jnp.asarray(x), pred_frames=pred,
                              actions=jnp.asarray(actions))

    diff = np.abs(np.asarray(preds).transpose(0, 1, 4, 2, 3)
                  - preds_ref.detach().numpy()).max()
    assert diff < ATOL, f"action-conditional PhyDNet mismatch: {diff}"
