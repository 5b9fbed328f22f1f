r"""Bundled metric calculation.

Capability parity with ``vp_suite/measure/metric_provider.py:8-73``, including
the per-prediction-horizon sweep (metrics for every prefix 1..T).
"""
import warnings

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

        frame_cnts = [frames] if not all_frame_cnts else list(range(1, frames + 1))
        results = [dict() for _ in frame_cnts]
        for key, metric in self.metrics.items():
            arrow = "↑" if metric.BIGGER_IS_BETTER else "↓"
            name = f"{key} ({arrow})"
            per_frame = None
            if len(frame_cnts) > 1:
                # fast path: ONE per-frame evaluation, prefix means on host —
                # avoids a jit-compile + full pass per prediction horizon
                try:
                    per_frame = metric.per_frame(pred[:, :frames], target[:, :frames])
                except ValueError:
                    per_frame = None
            if per_frame is not None:
                vals = np.asarray(per_frame, dtype=np.float64)  # [b, t]
                for idx, fc in enumerate(frame_cnts):
                    internal = float(vals[:, :fc].mean(axis=1).mean(axis=0))
                    results[idx][name] = float(metric.to_display(internal))
                continue
            for idx, fc in enumerate(frame_cnts):
                try:
                    metric_val = metric(pred[:, :fc], target[:, :fc])
                except ValueError:
                    metric_val = None
                if metric_val is None:
                    continue
                results[idx][name] = float(metric.to_display(float(np.asarray(metric_val))))
        return results
