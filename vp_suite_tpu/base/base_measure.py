r"""Base class for all measures (losses & metrics).

TPU-native analog of the reference ``VPMeasure``
(``vp_suite/base/base_measure.py:5-89``): measures are pure jittable functions
of ``(pred, target)`` 5-D arrays in NTHWC layout. The lower-is-better internal
convention and the ``to_display`` inversion hook are preserved.
"""
import jax
import jax.numpy as jnp


class VPMeasure:
    r"""Base measure. Subclasses implement :meth:`criterion` (elementwise) or
    override :meth:`forward` entirely. All forward passes are pure functions
    usable inside jit/grad; lower values always mean better predictions."""

    NAME: str = NotImplemented
    REFERENCE: str = None
    BIGGER_IS_BETTER: bool = False
    OPT_VALUE: float = 0.0

    def __init__(self, device: str = None):
        # `device` kept for reference API parity (base_measure.py:26-37);
        # placement is governed by jit/sharding in this framework.
        self.device = device

    def criterion(self, pred, target):
        r"""Elementwise criterion; overridden by deriving classes."""
        raise NotImplementedError

    def forward(self, pred, target):
        r"""Default reduction: elementwise criterion, summed over each image's
        pixels/channels, then averaged over frames and batch (parity:
        ``base_measure.py:39-57``). Expects [b, t, h, w, c]."""
        if pred.ndim != 5 or target.ndim != 5:
            raise ValueError(f"{self.NAME} expects 5-D inputs!")
        value = self.criterion(pred, target)
        return value.sum(axis=(2, 3, 4)).mean(axis=1).mean(axis=0)

    def __call__(self, pred, target):
        return self.forward(pred, target)

    def per_frame(self, pred, target):
        r"""Optional fast path: per-(batch, frame) values [b, t] whose prefix
        means reproduce :meth:`forward` on every horizon 1..t. Measures that
        can't decompose (e.g. FVD) return None and are evaluated per horizon."""
        return None

    @staticmethod
    def reshape_clamp(pred, target):
        r"""Reshapes to [b*t, h, w, c] and maps the (-1, 1)-ish value range to
        clamped [0, 1] (parity: ``base_measure.py:59-75``)."""
        pred = pred.reshape(-1, *pred.shape[2:])
        pred = jnp.clip((pred + 1.0) / 2.0, 0.0, 1.0)
        target = target.reshape(-1, *target.shape[2:])
        target = jnp.clip((target + 1.0) / 2.0, 0.0, 1.0)
        return pred, target

    @classmethod
    def to_display(cls, x):
        r"""Converts the lower-is-better internal value to the measure's
        natural representation (parity: ``base_measure.py:77-89``)."""
        return x
