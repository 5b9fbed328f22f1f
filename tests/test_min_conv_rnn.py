r"""MinConvRNN (time-parallel recurrence) tests: the associative-scan
evaluation must EXACTLY equal the sequential recurrence, and the model must
train. Registry shape tests cover it automatically (tests/test_models.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vp_suite_tpu.models import MODEL_CLASSES
from vp_suite_tpu.models.min_conv_rnn import linear_recurrence_scan


def test_linear_recurrence_scan_matches_sequential():
    rng = np.random.RandomState(0)
    t, shape = 13, (2, 4, 4, 3)
    f = jax.nn.sigmoid(jnp.asarray(rng.randn(t, *shape), jnp.float32))
    u = jnp.asarray(rng.randn(t, *shape), jnp.float32)
    h0 = jnp.asarray(rng.randn(*shape), jnp.float32)

    for init in (None, h0):
        h_par = linear_recurrence_scan(f, u, h0=init)
        h = jnp.zeros(shape) if init is None else init
        for ti in range(t):
            h = f[ti] * h + u[ti]
            np.testing.assert_allclose(np.asarray(h), np.asarray(h_par[ti]),
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"t={ti} init={init is not None}")


def test_min_conv_rnn_trains():
    r"""A few SGD steps on a constant-motion toy must reduce the loss."""
    from vp_suite_tpu.training.train_state import create_train_state
    from vp_suite_tpu.training.loop import make_train_step
    from vp_suite_tpu.measure.loss_provider import PredictionLossProvider

    IMG, CTX, PRED = 16, 3, 2
    model = MODEL_CLASSES["min-conv-rnn"](img_shape=(1, IMG, IMG),
                                          action_size=0,
                                          tensor_value_range=(0.0, 1.0),
                                          num_layers=2, hidden_dim=16)
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-2)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               context_frames=CTX, pred_frames=PRED)
    lp = PredictionLossProvider({"losses_and_scales": {"mse": 1.0},
                                 "img_c": 1, "device": None})
    step = make_train_step(model, {"context_frames": CTX, "pred_frames": PRED,
                                   "use_actions": False}, optimizer, lp,
                           donate=False)
    # moving vertical bar
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
