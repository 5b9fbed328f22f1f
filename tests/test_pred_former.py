r"""PredFormer-lite (space-time transformer, TPU-native extra).

Registry/shape/config coverage comes from the parameterized model tests;
this file pins the model-specific contracts: convergence on a toy motion,
horizon flexibility (one head serves any pred_frames), and context-length
flexibility up to max_frames (sliced temporal embeddings).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vp_suite_tpu.models import MODEL_CLASSES


def test_pred_former_trains():
    r"""A few Adam steps on a constant-motion toy must reduce the loss."""
    from vp_suite_tpu.training.train_state import create_train_state
    from vp_suite_tpu.training.loop import make_train_step
    from vp_suite_tpu.measure.loss_provider import PredictionLossProvider

    IMG, CTX, PRED = 16, 3, 2
    model = MODEL_CLASSES["pred-former"](img_shape=(1, IMG, IMG),
                                         action_size=0,
                                         tensor_value_range=(0.0, 1.0),
                                         dim=64, depth=2, heads=2)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               context_frames=CTX, pred_frames=PRED)
    lp = PredictionLossProvider({"losses_and_scales": {"mse": 1.0},
                                 "img_c": 1, "device": None})
    step = make_train_step(model, {"context_frames": CTX, "pred_frames": PRED,
                                   "use_actions": False}, optimizer, lp,
                           donate=False)
    frames = np.zeros((4, CTX + PRED, IMG, IMG, 1), np.float32)
    for bi in range(4):
        for t in range(CTX + PRED):
            frames[bi, t, :, (bi + t) % IMG] = 1.0
    batch = {"frames": jnp.asarray(frames),
             "actions": jnp.zeros((4, CTX + PRED, 1))}
    losses = []
    for _ in range(60):
        state, m = step(state, batch, jnp.asarray(0.0))
        losses.append(float(m["total"]))
    assert losses[-1] < 0.5 * losses[0], losses[::12]


def test_pred_former_horizon_and_context_flexible():
    r"""One parameter set serves any pred_frames and any context length
    <= max_frames (the head is per-frame; temporal embeddings slice)."""
    model = MODEL_CLASSES["pred-former"](img_shape=(3, 16, 16), action_size=0,
                                         tensor_value_range=(0.0, 1.0),
                                         dim=32, depth=1, heads=2)
    rng = np.random.RandomState(0)
    x3 = jnp.asarray(rng.rand(2, 3, 16, 16, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x3,
                           pred_frames=2)
    for ctx, pred in [(3, 1), (3, 4), (5, 2)]:
        x = jnp.asarray(rng.rand(2, ctx, 16, 16, 3), jnp.float32)
        preds, _ = model.apply(variables, x, pred_frames=pred)
        assert preds.shape == (2, pred, 16, 16, 3)
        assert np.isfinite(np.asarray(preds)).all()


def test_pred_former_rejects_bad_shapes():
    model = MODEL_CLASSES["pred-former"](img_shape=(3, 20, 20), action_size=0,
                                         tensor_value_range=(0.0, 1.0))
    x = jnp.zeros((1, 2, 20, 20, 3))
    with pytest.raises(ValueError, match="divide patch_size"):
        model.init({"params": jax.random.PRNGKey(0)}, x, pred_frames=1)

    model2 = MODEL_CLASSES["pred-former"](img_shape=(3, 16, 16), action_size=0,
                                          tensor_value_range=(0.0, 1.0),
                                          max_frames=4)
    x2 = jnp.zeros((1, 6, 16, 16, 3))
    with pytest.raises(ValueError, match="exceeds max_frames"):
        model2.init({"params": jax.random.PRNGKey(0)}, x2, pred_frames=1)
