r"""Impl-match: torch→JAX LPIPS weight conversion round trip.

Builds a random torch checkpoint in the layout ``convert_lpips`` documents
(torchvision-AlexNet ``features.<i>.weight/bias`` + official-LPIPS
``lin<i>.model.1.weight`` heads — the merged form of what the reference
loads through piqa, ``vp_suite/measure/image_wise.py:78-96``), converts it,
and asserts our JAX ``LPIPSNet`` matches a torch implementation of the
official LPIPS forward (scaling layer → AlexNet features → unit-normalize →
squared diff → 1x1 lin → spatial mean → sum) within 1e-4.
"""
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

ATOL = 1e-4

# torchvision AlexNet .features conv indices and their (out,in,k,stride,pad)
_CONVS = [
    (0, 64, 3, 11, 4, 2),
    (3, 192, 64, 5, 1, 2),
    (6, 384, 192, 3, 1, 1),
    (8, 256, 384, 3, 1, 1),
    (10, 256, 256, 3, 1, 1),
]
_POOL_BEFORE = {3, 6}  # maxpool(3,2) precedes these conv indices

_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def _torch_lpips(sd, pred, target):
    r"""Official-LPIPS forward in torch using the raw checkpoint tensors."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def feats(x):
        x = 2.0 * x - 1.0
        x = (x - shift) / scale
        out = []
        for idx, *_spec, stride, pad in _CONVS:
            if idx in _POOL_BEFORE:
                x = F.max_pool2d(x, 3, 2)
            x = F.conv2d(x, sd[f"features.{idx}.weight"],
                         sd[f"features.{idx}.bias"], stride=stride, padding=pad)
            x = F.relu(x)
            out.append(x)
        return out

    fp, ft = feats(pred), feats(target)
    total = 0.0
    for i, (a, b) in enumerate(zip(fp, ft)):
        # official normalize_tensor: x / (||x||_c + 1e-10)
        na = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        lin = sd[f"lin{i}.model.1.weight"]  # [1, c, 1, 1]
        total = total + F.conv2d(d, lin).mean(dim=(2, 3)).squeeze(1)
    return total


def test_impl():
    import torch
    from vp_suite_tpu.measure.convert_weights import convert_lpips
    from vp_suite_tpu.measure.lpips_net import LPIPSNet

    torch.manual_seed(0)
    sd = {}
    for idx, out_c, in_c, k, _stride, _pad in _CONVS:
        fan_in = in_c * k * k
        sd[f"features.{idx}.weight"] = torch.randn(out_c, in_c, k, k) * (2.0 / fan_in) ** 0.5
        sd[f"features.{idx}.bias"] = torch.randn(out_c) * 0.1
    for i, (_, out_c, *_rest) in enumerate(_CONVS):
        # official LPIPS lin weights are non-negative
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, out_c, 1, 1) / out_c

    with tempfile.TemporaryDirectory() as tmp:
        ckpt_fp = Path(tmp) / "lpips_random.pth"
        npz_fp = Path(tmp) / "lpips_random.npz"
        torch.save(sd, ckpt_fp)
        convert_lpips(ckpt_fp, out_fp=npz_fp)
        data = np.load(npz_fp)
        params = {k: jnp.asarray(data[k]) for k in data.files}

    net = LPIPSNet.__new__(LPIPSNet)
    net.params = params
    net.pretrained = True

    rng = np.random.default_rng(0)
    pred = rng.random((2, 64, 64, 3)).astype(np.float32)
    target = rng.random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        d_ref = _torch_lpips(sd, torch.tensor(pred).permute(0, 3, 1, 2),
                             torch.tensor(target).permute(0, 3, 1, 2)).numpy()
    with jax.default_matmul_precision("highest"):
        d = np.asarray(net.per_image(jnp.asarray(pred), jnp.asarray(target)))

    diff = np.abs(d - d_ref).max()
    assert diff < ATOL, f"LPIPS converted-distance mismatch: {diff}"
