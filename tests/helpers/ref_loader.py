r"""Loads the PyTorch reference implementation (read-only at /root/reference)
for golden-output equivalence tests.

The reference's import graph pulls optional deps (torchvision, piqa, wandb,
optuna, tfrecord, torchfile, moviepy) that aren't installed here; we stub them
with inert placeholders — the model-block modules under test only need torch.

This mirrors the reference's own impl-match strategy of importing upstream
implementations at test time (``tests/test_impl_match/test_impl_match.py:26-36``),
with /root/reference playing the role of the upstream repo. No reference code
is copied into this package.
"""
import sys
import types

_STUBBED = False


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def load_reference():
    r"""Makes ``vp_suite`` (the torch reference) importable; returns the module.
    Raises ImportError if torch is unavailable."""
    global _STUBBED
    import torch  # noqa: F401  (hard requirement)
    if not _STUBBED:
        # newer torch removed torch._utils._accumulate (the reference pins 1.10)
        import itertools
        import torch._utils as _tu
        if not hasattr(_tu, "_accumulate"):
            _tu._accumulate = lambda iterable, fn=None: itertools.accumulate(iterable)
        tv = _stub("torchvision")
        tv.__path__ = []  # mark as package so submodule stubs resolve
        names = ["CenterCrop", "RandomCrop", "RandomErasing", "Normalize", "RandomEqualize",
                 "RandomAutocontrast", "RandomAdjustSharpness", "RandomSolarize",
                 "RandomPosterize", "RandomInvert", "GaussianBlur", "RandomVerticalFlip",
                 "RandomRotation", "RandomHorizontalFlip", "RandomGrayscale", "Grayscale",
                 "ColorJitter"]

        # functional Resize (the reference uses it inside model decoders,
        # enc.py:89,134 / lstm.py:57): torchvision-0.11 tensor semantics =
        # bilinear, align_corners=False, no antialias
        import torch.nn as _tnn
        import torch.nn.functional as _tF

        class _Resize(_tnn.Module):
            def __init__(self, size=None, **kw):
                super().__init__()
                self.size = (size, size) if isinstance(size, int) else tuple(size)

            def forward(self, x):
                if tuple(x.shape[-2:]) == self.size:
                    return x
                lead = x.shape[:-3]
                flat = x.reshape(-1, *x.shape[-3:])
                out = _tF.interpolate(flat, size=self.size, mode="bilinear",
                                      align_corners=False)
                return out.reshape(*lead, x.shape[-3], *self.size)

        tvt = _stub("torchvision.transforms",
                    **{n: type(n, (), {}) for n in names}, Resize=_Resize)
        tv.transforms = tvt
        tvd = _stub("torchvision.datasets", MNIST=type("MNIST", (), {}))
        tv.datasets = tvd
        tvt.__path__ = []
        tv.transforms.functional = _stub("torchvision.transforms.functional",
                                         resize=lambda x, size: x)
        tv.io = _stub("torchvision.io", read_video=lambda *a, **kw: None)
        tv.datasets.MNIST = tvd.MNIST
        _stub("piqa")
        _stub("piqa.lpips", LPIPS=type("LPIPS", (), {}))
        _stub("piqa.ssim", SSIM=type("SSIM", (), {}))
        _stub("wandb", init=lambda **kw: None, log=lambda *a, **kw: None,
              finish=lambda: None, Video=type("Video", (), {}))
        _stub("optuna")
        _stub("torchfile", load=lambda *a, **kw: None)
        tfr = _stub("tfrecord")
        tfr.__path__ = []  # mark as package so submodule stubs resolve
        _stub("tfrecord.tools")
        _stub("tfrecord.tools.tfrecord2idx", create_index=lambda *a, **kw: None)
        _stub("tfrecord.reader", tfrecord_loader=lambda *a, **kw: iter(()))
        _stub("tfrecord.torch")
        _stub("tfrecord.torch.dataset", TFRecordDataset=type("TFRecordDataset", (), {}))
        mp = _stub("moviepy")
        mp.__path__ = []
        _stub("moviepy.editor", ImageSequenceClip=type("ImageSequenceClip", (), {}))
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        _STUBBED = True
    import vp_suite  # noqa: F401
    return vp_suite
