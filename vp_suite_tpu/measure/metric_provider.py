r"""Bundled metric calculation.

Capability parity with ``vp_suite/measure/metric_provider.py:8-73``, including
the per-prediction-horizon sweep (metrics for every prefix 1..T).
"""
import warnings

import jax.numpy as jnp
import numpy as np

from vp_suite_tpu.measure import METRIC_CLASSES


class PredictionMetricProvider:
    def __init__(self, config: dict):
        self.device = config.get("device")
        self.available_metrics = dict(METRIC_CLASSES) if config["metrics"] == "all" \
            else {k: METRIC_CLASSES[k] for k in config["metrics"]}
        if config["img_c"] not in [2, 3] and "fvd" in self.available_metrics:
            warnings.warn("'FVD' measure won't be used since image channels needs to be in [2, 3]")
            self.available_metrics.pop("fvd")
        self.metrics = {k: metric(device=self.device) for k, metric in self.available_metrics.items()}

    def get_metrics(self, pred, target, frames: int = None, all_frame_cnts: bool = False):
        r"""pred/target: [b, t, h, w, c]. Returns a list of dicts (one per
        evaluated frame count) of display values."""
        if pred.ndim != 5 or target.ndim != 5:
            raise ValueError("Input tensors expected to be 5-dimensional!")
        if pred.shape != target.shape:
            raise ValueError("Output images and target images are of different shape!")
        frames = frames or pred.shape[1]

        results = []
        frame_cnts = [frames] if not all_frame_cnts else range(1, frames + 1)
        for frame_cnt in frame_cnts:
            pred_ = pred[:, :frame_cnt]
            target_ = target[:, :frame_cnt]
            frame_cnt_metrics = {}
            for key, metric in self.metrics.items():
                try:
                    metric_val = metric(pred_, target_)
                except ValueError:
                    metric_val = None
                if metric_val is None:
                    continue
                arrow = "↑" if metric.BIGGER_IS_BETTER else "↓"
                frame_cnt_metrics[f"{key} ({arrow})"] = float(metric.to_display(
                    float(np.asarray(metric_val))))
            results.append(frame_cnt_metrics)
        return results
