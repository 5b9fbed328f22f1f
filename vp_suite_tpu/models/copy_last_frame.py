r"""CopyLastFrame baseline.

Capability parity with ``vp_suite/models/copy_last_frame.py:4-17``:
non-trainable baseline that repeats the last context frame.
"""
import jax.numpy as jnp

from vp_suite_tpu.base.base_model import VPModel


class CopyLastFrame(VPModel):
    NAME = "CopyLastFrame"
    TRAINABLE = False

    def pred_1(self, x, **kwargs):
        return x[:, -1]

    def __call__(self, x, pred_frames: int = 1, actions=None, train: bool = False, **kwargs):
        last = x[:, -1:]
        preds = jnp.tile(last, (1, pred_frames, 1, 1, 1))
        return preds, None

    def init_params(self, rng, batch_size: int = 1, context_frames: int = None):
        return {}

    def apply(self, variables, x, pred_frames: int = 1, actions=None, train: bool = False,
              **kwargs):
        r"""Params-free apply (overrides the flax machinery; this baseline has
        no parameters)."""
        return self(x, pred_frames=pred_frames, actions=actions, train=train, **kwargs)
