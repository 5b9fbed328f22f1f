r"""Impl-match: ACTION-CONDITIONAL UNet-3D vs. reference
(``vp_suite/models/unet3d.py`` action path: per-level action inflation
linears + bottleneck inflation + widened convs) — validates the merged
time-in-channels layout's action concat ordering (t-major channel blocks)
against the reference's NDCHW concat."""
import jax
import jax.numpy as jnp
import numpy as np

from helpers.ref_loader import load_reference
from helpers.weight_convert import conv_w, conv3d_w, convT_w, linear_w, vec

ATOL = 1e-4


def _bn(tbn):
    return {"scale": vec(tbn.weight), "bias": vec(tbn.bias),
            "mean": vec(tbn.running_mean), "var": vec(tbn.running_var)}


def _double_conv(seq, three_d):
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
    img, td, a = 32, 3, 2
    kwargs = dict(img_shape=(3, img, img), action_size=a,
                  tensor_value_range=(0.0, 1.0), temporal_dim=td,
                  action_conditional=True)
    ref = Ref("cpu", **kwargs)
    ref.eval()
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
        params[f"action_inflate{i}"] = {
            "kernel": linear_w(ref.action_inflates[i].weight),
            "bias": vec(ref.action_inflates[i].bias)}
    params["time3d_bn"] = {"kernel": conv3d_w(ref.time3ds[-1].weight),
                           "bias": vec(ref.time3ds[-1].bias)}
    params["bottleneck_action_inflate"] = {
        "kernel": linear_w(ref.bottleneck_action_inflate.weight),
        "bias": vec(ref.bottleneck_action_inflate.bias)}
    put_double("bottleneck", ref.bottleneck, three_d=False)
    for i in range(0, len(ref.ups), 2):
        params[f"up_t{i//2}"] = {"kernel": convT_w(ref.ups[i].weight),
                                 "bias": vec(ref.ups[i].bias)}
        put_double(f"up_c{i//2}", ref.ups[i + 1], three_d=False)
    params["final_conv"] = {"kernel": conv_w(ref.final_conv.weight),
                            "bias": vec(ref.final_conv.bias)}

    variables = {"params": params, "batch_stats": batch_stats}

    rng = np.random.default_rng(0)
    pred = 2
    x = rng.standard_normal((2, td, img, img, 3)).astype(np.float32)
    actions = rng.standard_normal((2, td + pred, a)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 1, 4, 2, 3)
    with torch.no_grad():
        preds_ref, _ = ref(xt, pred_frames=pred,
                           actions=torch.tensor(actions))
    with jax.default_matmul_precision("highest"):
        preds, _ = ours.apply(variables, jnp.asarray(x), pred_frames=pred,
                              actions=jnp.asarray(actions))

    diff = np.abs(np.asarray(preds).transpose(0, 1, 4, 2, 3)
                  - preds_ref.detach().numpy()).max()
    assert diff < ATOL, f"action-conditional UNet-3D mismatch: {diff}"
