r"""Impl-match: torch→JAX I3D weight conversion round trip.

Saves a randomly-initialized reference InceptionI3d state_dict
(``vp_suite/measure/fvd/_pytorch_i3d/pytorch_i3d.py:152-342``), runs
``convert_weights.convert_i3d`` on it, and asserts the JAX feature
extractor (``measure/fvd/i3d.py``) reproduces the torch
``extract_features`` output within 1e-4 — validating the entire
pretrained-FVD path up to the missing checkpoint file itself.
"""
import tempfile
from pathlib import Path

import jax
import numpy as np

from helpers.ref_loader import load_reference

ATOL = 1e-4


def test_impl():
    import torch
    load_reference()
    from vp_suite.measure.fvd._pytorch_i3d.pytorch_i3d import InceptionI3d
    from vp_suite_tpu.measure.convert_weights import convert_i3d
    from vp_suite_tpu.measure.fvd.i3d import i3d_features

    torch.manual_seed(0)
    ref = InceptionI3d(num_classes=400, in_channels=3)
    ref.eval()
    # randomize BN affine params + running stats so eval-mode normalization
    # is non-trivial (fresh init has mean=0/var=1/weight=1/bias=0)
    with torch.no_grad():
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm3d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
                mod.weight.uniform_(0.8, 1.2)
                mod.bias.uniform_(-0.2, 0.2)

    with tempfile.TemporaryDirectory() as tmp:
        ckpt_fp = Path(tmp) / "i3d_random.pt"
        npz_fp = Path(tmp) / "i3d_random.npz"
        torch.save(ref.state_dict(), ckpt_fp)
        convert_i3d(ckpt_fp, out_fp=npz_fp)
        data = np.load(npz_fp)
        params = {k: np.asarray(data[k]) for k in data.files}

    rng = np.random.default_rng(0)
    # t=9 is the smallest chunk FVD feeds the net; 224x224 is required
    # (avg_pool kernel (2,7,7) VALID needs 7x7 spatial at the head)
    x = rng.standard_normal((1, 9, 224, 224, 3)).astype(np.float32)
    xt = torch.tensor(x).permute(0, 4, 1, 2, 3)  # NCDHW
    with torch.no_grad():
        feats_ref = ref.extract_features(xt).squeeze().numpy()  # [400]
    with jax.default_matmul_precision("highest"):
        feats = np.asarray(i3d_features(x, params))[0]

    diff = np.abs(feats - feats_ref).max()
    assert diff < ATOL, f"I3D converted-feature mismatch: {diff}"
