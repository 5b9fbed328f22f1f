r"""Image-wise measures: MSE, L1, SmoothL1, PSNR, SSIM, LPIPS.

Capability parity with the reference (``vp_suite/measure/image_wise.py:19-121``)
as pure jittable functions on NTHWC tensors. SSIM is our own windowed
implementation (gaussian 11x11, sigma 1.5 — the piqa defaults the reference
uses); LPIPS is an AlexNet-feature metric with a torch-weight conversion path
(see ``vp_suite_tpu/measure/lpips_net.py``).
"""
import jax
import jax.numpy as jnp
from jax import lax

from vp_suite_tpu.base.base_measure import VPMeasure


class MSE(VPMeasure):
    r"""Pixel-wise mean squared error (parity: ``image_wise.py:19-27``)."""
    NAME = "Mean Squared Error (MSE) / L2 Loss"

    def criterion(self, pred, target):
        d = pred - target
        return d * d

    def per_frame(self, pred, target):
        return self.criterion(pred, target).sum(axis=(2, 3, 4))


class L1(VPMeasure):
    r"""Pixel-wise mean absolute error (parity: ``image_wise.py:30-38``)."""
    NAME = "Mean Absolute Error (MAE) / L1 Loss"

    def criterion(self, pred, target):
        return jnp.abs(pred - target)

    def per_frame(self, pred, target):
        return self.criterion(pred, target).sum(axis=(2, 3, 4))


class SmoothL1(VPMeasure):
    r"""Huber-style smooth L1 with beta=1 (torch ``nn.SmoothL1Loss`` parity;
    reference: ``image_wise.py:41-50``)."""
    NAME = "Smooth L1 Loss"

    def criterion(self, pred, target):
        d = jnp.abs(pred - target)
        return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)

    def per_frame(self, pred, target):
        return self.criterion(pred, target).sum(axis=(2, 3, 4))


class PSNR(VPMeasure):
    r"""Peak signal-to-noise ratio; internal loss form is ``10*log10(mse)``
    averaged over frames and batch, display negates
    (parity: ``image_wise.py:53-75``)."""
    NAME = "Peak Signal to Noise Ratio (PSNR)"
    BIGGER_IS_BETTER = True
    OPT_VALUE = float("inf")

    def forward(self, pred, target):
        if pred.ndim != 5 or target.ndim != 5:
            raise ValueError(f"{self.NAME} expects 5-D inputs!")
        d = pred - target
        mses = (d * d).mean(axis=(-1, -2, -3))  # [b, t]
        psnr_losses = jnp.log10(mses) * 10.0
        return psnr_losses.mean(axis=1).mean(axis=0)

    def per_frame(self, pred, target):
        d = pred - target
        return jnp.log10((d * d).mean(axis=(-1, -2, -3))) * 10.0

    @classmethod
    def to_display(cls, x):
        return -x


def _gaussian_kernel(size=11, sigma=1.5, dtype=jnp.float32):
    coords = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    g = jnp.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    return g / g.sum()


def ssim_per_image(pred, target, kernel_size=11, sigma=1.5, value_range=1.0,
                   k1=0.01, k2=0.03):
    r"""Windowed SSIM over [n, h, w, c] images (separable gaussian window,
    VALID padding — the convention the reference inherits from piqa).
    Returns per-image SSIM in [-1, 1]."""
    c1 = (k1 * value_range) ** 2
    c2 = (k2 * value_range) ** 2
    win = _gaussian_kernel(kernel_size, sigma, pred.dtype)
    c = pred.shape[-1]

    def blur(x):
        # separable depthwise gaussian: rows then cols. HIGHEST precision:
        # TPU's default bf16 conv precision causes catastrophic cancellation
        # in the mu_xx - mu_x^2 variance estimates (SSIM > 1 artifacts)
        kh = jnp.tile(win.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
        kw = jnp.tile(win.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
        x = lax.conv_general_dilated(x, kh, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     feature_group_count=c,
                                     precision=lax.Precision.HIGHEST)
        x = lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     feature_group_count=c,
                                     precision=lax.Precision.HIGHEST)
        return x

    mu_x = blur(pred)
    mu_y = blur(target)
    mu_xx = blur(pred * pred)
    mu_yy = blur(target * target)
    mu_xy = blur(pred * target)

    sigma_x = mu_xx - mu_x * mu_x
    sigma_y = mu_yy - mu_y * mu_y
    sigma_xy = mu_xy - mu_x * mu_y

    num = (2.0 * mu_x * mu_y + c1) * (2.0 * sigma_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2)
    return (num / den).mean(axis=(1, 2, 3))


class SSIM(VPMeasure):
    r"""Structural similarity; internal loss form is ``1 - SSIM``
    (parity: ``image_wise.py:99-121``). Requires 3-channel input like the
    reference."""
    NAME = "Structural Similarity (SSIM)"
    REFERENCE = "https://ieeexplore.ieee.org/document/1284395"
    BIGGER_IS_BETTER = True
    OPT_VALUE = 1

    def forward(self, pred, target):
        if pred.shape[-1] != 3 or target.shape[-1] != 3:
            raise ValueError(f"{self.NAME} needs 3-channel images (channels last)")
        pred, target = self.reshape_clamp(pred.astype(jnp.float32),
                                          target.astype(jnp.float32))
        return 1.0 - ssim_per_image(pred, target).mean()

    def per_frame(self, pred, target):
        b, t = pred.shape[:2]
        p, tg = self.reshape_clamp(pred.astype(jnp.float32),
                                   target.astype(jnp.float32))
        return 1.0 - ssim_per_image(p, tg).reshape(b, t)

    @classmethod
    def to_display(cls, x):
        return 1.0 - x


class LPIPS(VPMeasure):
    r"""Learned Perceptual Image Patch Similarity over AlexNet features
    (parity intent: ``image_wise.py:78-96``). Uses converted torch weights when
    available; otherwise falls back to deterministic random features (still a
    valid perceptual-style distance, clearly flagged — pretrained weights
    cannot be downloaded in a zero-egress environment)."""
    NAME = "Learned Perceptual Image Patch Similarity (LPIPS)"
    REFERENCE = "https://arxiv.org/abs/1801.03924"

    def __init__(self, device: str = None):
        super().__init__(device)
        from vp_suite_tpu.measure.lpips_net import LPIPSNet
        self.net = LPIPSNet()

    def forward(self, pred, target):
        if pred.shape[-1] != 3 or target.shape[-1] != 3:
            raise ValueError(f"{self.NAME} needs 3-channel images (channels last)")
        pred, target = self.reshape_clamp(pred, target)
        # AlexNet features need >= 64px spatial; upscale tiny inputs
        if pred.shape[1] < 64 or pred.shape[2] < 64:
            from vp_suite_tpu.ops.image import resize_bilinear
            pred = resize_bilinear(pred, (max(64, pred.shape[1]), max(64, pred.shape[2])))
            target = resize_bilinear(target, (max(64, target.shape[1]), max(64, target.shape[2])))
        return self.net(pred, target)

    def per_frame(self, pred, target):
        b, t = pred.shape[:2]
        p, tg = self.reshape_clamp(pred, target)
        if p.shape[1] < 64 or p.shape[2] < 64:
            from vp_suite_tpu.ops.image import resize_bilinear
            p = resize_bilinear(p, (max(64, p.shape[1]), max(64, p.shape[2])))
            tg = resize_bilinear(tg, (max(64, tg.shape[1]), max(64, tg.shape[2])))
        return self.net.per_image(p, tg).reshape(b, t)
