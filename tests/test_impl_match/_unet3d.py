r"""Impl-match: full UNet-3D model (non-action-conditional) vs. reference
(``vp_suite/models/unet3d.py``) — validates DoubleConv2d/3d (incl. BatchNorm
eval statistics), time-collapsing skips, pooling and the transposed-conv up
path end to end."""
import jax
import jax.numpy as jnp
import numpy as np

from helpers.ref_loader import load_reference
from helpers.weight_convert import conv_w, conv3d_w, convT_w, vec

ATOL = 1e-4


def _bn(tbn):
    return {"scale": vec(tbn.weight), "bias": vec(tbn.bias),
            "mean": vec(tbn.running_mean), "var": vec(tbn.running_var)}


def _double_conv(seq, three_d):
    r"""torch DoubleConv Sequential: [conv, bn, relu, conv, bn, relu]."""
    cw = conv3d_w if three_d else conv_w
    return ({"conv1": {"kernel": cw(seq.conv[0].weight)},
             "bn1": _bn(seq.conv[1]),
             "conv2": {"kernel": cw(seq.conv[3].weight)},
             "bn2": _bn(seq.conv[4])})


def test_impl():
    import torch
    load_reference()
    from vp_suite.models.unet3d import UNet3D as Ref
    from vp_suite_tpu.models import MODEL_CLASSES

    torch.manual_seed(0)
    img, td = 32, 3
    kwargs = dict(img_shape=(3, img, img), action_size=0,
                  tensor_value_range=(0.0, 1.0), temporal_dim=td)
    ref = Ref("cpu", **kwargs)
    ref.eval()
    # randomize BN running stats so the eval-mode normalization is non-trivial
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)

    ours = MODEL_CLASSES["unet-3d"](**kwargs)

    params = {}
    batch_stats = {}

    def put_double(name, src, three_d):
        conv = _double_conv(src, three_d)
        params[name] = {"conv1": conv["conv1"], "conv2": conv["conv2"],
                        "bn1": {"scale": conv["bn1"]["scale"],
                                "bias": conv["bn1"]["bias"]},
                        "bn2": {"scale": conv["bn2"]["scale"],
                                "bias": conv["bn2"]["bias"]}}
        batch_stats[name] = {
            "bn1": {"mean": conv["bn1"]["mean"], "var": conv["bn1"]["var"]},
            "bn2": {"mean": conv["bn2"]["mean"], "var": conv["bn2"]["var"]},
        }

    for i, down in enumerate(ref.downs):
        put_double(f"down{i}", down, three_d=True)
        params[f"time3d_{i}"] = {"kernel": conv3d_w(ref.time3ds[i].weight),
                                 "bias": vec(ref.time3ds[i].bias)}
    params["time3d_bn"] = {"kernel": conv3d_w(ref.time3ds[-1].weight),
                           "bias": vec(ref.time3ds[-1].bias)}
    put_double("bottleneck", ref.bottleneck, three_d=False)
    for i in range(0, len(ref.ups), 2):
        params[f"up_t{i//2}"] = {"kernel": convT_w(ref.ups[i].weight),
                                 "bias": vec(ref.ups[i].bias)}
        put_double(f"up_c{i//2}", ref.ups[i + 1], three_d=False)
    params["final_conv"] = {"kernel": conv_w(ref.final_conv.weight),
                            "bias": vec(ref.final_conv.bias)}

    variables = {"params": params, "batch_stats": batch_stats}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, td, img, img, 3)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        preds_ref, _ = ref(xt, pred_frames=2)
    with jax.default_matmul_precision("highest"):
        preds, _ = ours.apply(variables, jnp.asarray(x), pred_frames=2)

    diff = np.abs(np.asarray(preds).transpose(0, 1, 4, 2, 3)
                  - preds_ref.detach().numpy()).max()
    assert diff < ATOL, f"UNet-3D prediction mismatch: {diff}"
