r"""One-time PyTorch → JAX weight conversion for pretrained perceptual nets.

The reference ships/loads pretrained torch checkpoints for LPIPS (via piqa)
and FVD's I3D (``vp_suite/measure/fvd/fvd.py:33,46-49``). This environment has
no network egress, so conversion is gated on a locally available checkpoint:

    python -m vp_suite_tpu.measure.convert_weights --i3d /path/to/rgb_imagenet.pt
    python -m vp_suite_tpu.measure.convert_weights --lpips /path/to/lpips_alex.pth

Outputs land in ``vp_suite_tpu/resources/`` where the measures pick them up
automatically (``lpips_net.py`` / ``fvd/i3d.py``).
"""
import argparse
from pathlib import Path

import numpy as np

RESOURCES = Path(__file__).parent.parent / "resources"


def convert_i3d(ckpt_path, out_fp=None):
    r"""Converts the torch I3D state_dict (pytorch_i3d naming) to our flat
    NDHWC param dict."""
    import torch
    sd = torch.load(ckpt_path, map_location="cpu")
    out = {}

    def conv(prefix_t, prefix_j, bn=True, bias=False):
        w = sd[f"{prefix_t}.conv3d.weight"].numpy()  # [out, in, t, h, w]
        out[f"{prefix_j}_kernel"] = w.transpose(2, 3, 4, 1, 0)
        if bias and f"{prefix_t}.conv3d.bias" in sd:
            out[f"{prefix_j}_bias"] = sd[f"{prefix_t}.conv3d.bias"].numpy()
        if bn:
            out[f"{prefix_j}_bn_mean"] = sd[f"{prefix_t}.bn.running_mean"].numpy()
            out[f"{prefix_j}_bn_var"] = sd[f"{prefix_t}.bn.running_var"].numpy()
            out[f"{prefix_j}_bn_scale"] = sd[f"{prefix_t}.bn.weight"].numpy()
            out[f"{prefix_j}_bn_bias"] = sd[f"{prefix_t}.bn.bias"].numpy()

    for name in ["Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"]:
        conv(name, name)
    for name in ["Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d",
                 "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c"]:
        for branch_t, branch_j in [("b0", "b0"), ("b1a", "b1a"), ("b1b", "b1b"),
                                   ("b2a", "b2a"), ("b2b", "b2b"), ("b3b", "b3b")]:
            conv(f"{name}.{branch_t}", f"{name}_{branch_j}")
    conv("logits", "logits", bn=False, bias=True)

    out_fp = out_fp or RESOURCES / "i3d_rgb_imagenet.npz"
    RESOURCES.mkdir(parents=True, exist_ok=True)
    np.savez(out_fp, **out)
    print(f"saved {len(out)} arrays to {out_fp}")


def convert_lpips(ckpt_path, out_fp=None):
    r"""Converts torchvision-AlexNet features + LPIPS linear heads to our flat
    param dict. Expects a dict with 'features.<i>.weight/bias' (AlexNet) and
    'lin<i>.model.1.weight' (LPIPS heads) entries."""
    import torch
    sd = torch.load(ckpt_path, map_location="cpu")
    out = {}
    # torchvision AlexNet conv layer indices in .features
    conv_idx = [0, 3, 6, 8, 10]
    for i, idx in enumerate(conv_idx):
        w = sd[f"features.{idx}.weight"].numpy()  # [out, in, kh, kw]
        out[f"conv{i}_kernel"] = w.transpose(2, 3, 1, 0)
        out[f"conv{i}_bias"] = sd[f"features.{idx}.bias"].numpy()
        lw = sd[f"lin{i}.model.1.weight"].numpy()  # [1, c, 1, 1]
        out[f"lin{i}"] = lw.reshape(-1)
    out_fp = out_fp or RESOURCES / "lpips_alexnet.npz"
    RESOURCES.mkdir(parents=True, exist_ok=True)
    np.savez(out_fp, **out)
    print(f"saved {len(out)} arrays to {out_fp}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--i3d", type=str, default=None)
    parser.add_argument("--lpips", type=str, default=None)
    args = parser.parse_args()
    if args.i3d:
        convert_i3d(args.i3d)
    if args.lpips:
        convert_lpips(args.lpips)
    if not args.i3d and not args.lpips:
        print("nothing to do (pass --i3d and/or --lpips)")
