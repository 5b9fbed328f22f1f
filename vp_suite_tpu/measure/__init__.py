r"""Measure registries (parity: ``vp_suite/measure/__init__.py:11-33``).

Every measure doubles as a differentiable loss and a test metric, so both
registries are built from one table.
"""
from vp_suite_tpu.measure.image_wise import MSE, L1, SmoothL1, LPIPS, SSIM, PSNR
from vp_suite_tpu.measure.fvd.fvd import FrechetVideoDistance

_MEASURES = (
    ("mse", MSE),
    ("l1", L1),
    ("smooth_l1", SmoothL1),
    ("lpips", LPIPS),
    ("ssim", SSIM),
    ("psnr", PSNR),
    ("fvd", FrechetVideoDistance),
)

LOSS_CLASSES = dict(_MEASURES)
AVAILABLE_LOSSES = LOSS_CLASSES.keys()

METRIC_CLASSES = dict(_MEASURES)
AVAILABLE_METRICS = METRIC_CLASSES.keys()
