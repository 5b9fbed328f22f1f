r"""Functional training state.

Replaces the reference's implicit state scattered across the torch module,
the optimizer object and mutable model attributes (``vp_suite/vpsuite.py:
350-355``, ``models/predrnn_v2.py:124-126``) with ONE explicit pytree that
jitted steps consume and return.
"""
from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Any
    extra_vars: Dict[str, Any]          #: non-trained collections (e.g. batch_stats).
    opt_state: Any
    step: jnp.ndarray                   #: global step counter.
    model_state: Dict[str, Any]         #: functional training schedules (sampling eta, ...).
    rng: jax.Array                      #: per-state PRNG key, split every step.


def create_train_state(model, optimizer, rng, batch_size=1, context_frames=None,
                       pred_frames=1):
    r"""Initializes params + optimizer state for a model."""
    init_rng, state_rng = jax.random.split(rng)
    if not model.TRAINABLE or model.img_shape is None:
        return TrainState(params={}, extra_vars={}, opt_state=None,
                          step=jnp.asarray(0, jnp.int32),
                          model_state=model.init_model_state(), rng=state_rng)
    ctx = context_frames or max(getattr(model, "MIN_CONTEXT_FRAMES", 1) or 1, 2)
    total = ctx + pred_frames if model.NEEDS_COMPLETE_INPUT else ctx
    c, h, w = model.img_shape
    x = jnp.zeros((batch_size, total, h, w, c), dtype=jnp.float32)
    actions = jnp.zeros((batch_size, total + pred_frames, max(model.action_size, 1)),
                        dtype=jnp.float32)
    kwargs = {}
    if model.__class__.__name__ == "UNet3D" or model.CAN_HANDLE_ACTIONS:
        kwargs["actions"] = actions
    variables = model.init({"params": init_rng, "sample": init_rng}, x,
                           pred_frames=pred_frames, **kwargs)
    variables = dict(variables)
    params = variables.pop("params", {})
    opt_state = optimizer.init(params) if model.TRAINABLE else None
    return TrainState(params=params, extra_vars=variables, opt_state=opt_state,
                      step=jnp.asarray(0, jnp.int32),
                      model_state=model.init_model_state(), rng=state_rng)
