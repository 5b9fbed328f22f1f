r"""Bundled loss calculation.

Capability parity with ``vp_suite/measure/loss_provider.py:6-53``. The
``get_losses`` method is pure/jittable (used inside compiled train steps).
"""
import warnings

import jax.numpy as jnp

from vp_suite_tpu.measure import LOSS_CLASSES


class PredictionLossProvider:
    r"""Instantiates the configured losses and computes them all on one
    (pred, target) pair, returning display values and the scaled total."""

    def __init__(self, config: dict):
        self.device = config.get("device")
        loss_scales = dict(config["losses_and_scales"])
        if "fvd" in loss_scales and config["img_c"] not in [2, 3]:
            warnings.warn("'FVD' measure won't be used since image channels needs to be in [2, 3]")
            loss_scales.pop("fvd")
        self.losses = {k: (LOSS_CLASSES[k](device=self.device), scale)
                       for k, scale in loss_scales.items()}

    def get_losses(self, pred, target):
        r"""pred/target: [b, t, h, w, c]. Returns (display dict, total)."""
        if pred.shape != target.shape:
            raise ValueError("Output images and target images are of different shape!")
        loss_display_values, total_loss = {}, jnp.float32(0.0)
        for key, (loss, scale) in self.losses.items():
            val = loss(pred, target)
            if val is None:  # e.g. FVD on too-short sequences
                continue
            total_loss = total_loss + scale * val
            loss_display_values[key] = loss.to_display(val)
        return loss_display_values, total_loss
