r"""SimVP-lite (one-shot conv translator, TPU-native extra).

Registry/shape/config coverage comes from the parameterized model tests;
this file pins the model-specific contracts: convergence on a toy motion,
the one-shot/chunked-rollout horizon semantics, and the shape guards.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from vp_suite_tpu.models import MODEL_CLASSES


def test_simvp_trains():
    r"""A few Adam steps on a constant-motion toy must reduce the loss."""
    from vp_suite_tpu.training.train_state import create_train_state
    from vp_suite_tpu.training.loop import make_train_step
    from vp_suite_tpu.measure.loss_provider import PredictionLossProvider

    IMG, CTX, PRED = 16, 3, 2
    model = MODEL_CLASSES["simvp"](img_shape=(1, IMG, IMG), action_size=0,
                                   tensor_value_range=(0.0, 1.0),
                                   hid_s=16, hid_t=32, n_trans=2,
                                   out_frames=PRED)
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


def test_simvp_horizon_chunking():
    r"""One parameter set serves any horizon: pred < out_frames slices the
    one-shot chunk, pred > out_frames rolls out chunkwise, and the first
    ``out_frames`` predictions are identical either way (prefix property of
    chunked autoregression)."""
    model = MODEL_CLASSES["simvp"](img_shape=(3, 16, 16), action_size=0,
                                   tensor_value_range=(0.0, 1.0),
                                   hid_s=8, hid_t=16, n_trans=1, out_frames=3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 4, 16, 16, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, pred_frames=3)
    outs = {}
    for pred in (1, 3, 7):
        preds, _ = model.apply(variables, x, pred_frames=pred)
        assert preds.shape == (2, pred, 16, 16, 3)
        assert np.isfinite(np.asarray(preds)).all()
        outs[pred] = np.asarray(preds)
    np.testing.assert_allclose(outs[1], outs[3][:, :1], atol=1e-6)
    np.testing.assert_allclose(outs[3], outs[7][:, :3], atol=1e-6)


def test_simvp_rejects_bad_shapes():
    model = MODEL_CLASSES["simvp"](img_shape=(3, 18, 18), action_size=0,
                                   tensor_value_range=(0.0, 1.0))
    x = jnp.zeros((1, 2, 18, 18, 3))
    with pytest.raises(ValueError, match="divisible by 4"):
        model.init({"params": jax.random.PRNGKey(0)}, x, pred_frames=1)

    model2 = MODEL_CLASSES["simvp"](img_shape=(3, 16, 16), action_size=0,
                                    tensor_value_range=(0.0, 1.0))
    x2 = jnp.zeros((1, 2, 12, 12, 3))
    with pytest.raises(ValueError, match="does not match"):
        model2.init({"params": jax.random.PRNGKey(0)}, x2, pred_frames=1)
