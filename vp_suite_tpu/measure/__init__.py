r"""Measure registries (parity: ``vp_suite/measure/__init__.py:11-33``)."""
from vp_suite_tpu.measure.image_wise import MSE, L1, SmoothL1, LPIPS, SSIM, PSNR
from vp_suite_tpu.measure.fvd.fvd import FrechetVideoDistance

LOSS_CLASSES = {
    "mse": MSE,
    "l1": L1,
    "smooth_l1": SmoothL1,
    "lpips": LPIPS,
    "ssim": SSIM,
    "psnr": PSNR,
    "fvd": FrechetVideoDistance,
}
AVAILABLE_LOSSES = LOSS_CLASSES.keys()

METRIC_CLASSES = {
    "mse": MSE,
    "l1": L1,
    "smooth_l1": SmoothL1,
    "lpips": LPIPS,
    "ssim": SSIM,
    "psnr": PSNR,
    "fvd": FrechetVideoDistance,
}
AVAILABLE_METRICS = METRIC_CLASSES.keys()
