r"""Gradient-accumulation tests: accumulated microbatch gradients must equal
the full-batch gradient (one optimizer update either way). A capability the
reference lacks (its train_iter is one backward per DataLoader batch,
``vp_suite/base/base_model.py:148-179``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vp_suite_tpu.models import MODEL_CLASSES
from vp_suite_tpu.training.train_state import create_train_state
from vp_suite_tpu.training.loop import make_train_step
from vp_suite_tpu.measure.loss_provider import PredictionLossProvider

IMG, CTX, PRED = 16, 2, 2


def _setup(accum, batch=8, opt="sgd"):
    model = MODEL_CLASSES["convlstm-shi"](img_shape=(3, IMG, IMG), action_size=0,
                                          tensor_value_range=(0.0, 1.0))
    run_config = {"context_frames": CTX, "pred_frames": PRED, "use_actions": False}
    optimizer = optax.inject_hyperparams(getattr(optax, opt))(learning_rate=1e-3)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               context_frames=CTX, pred_frames=PRED)
    lp = PredictionLossProvider({"losses_and_scales": {"mse": 1.0}, "img_c": 3,
                                 "device": None})
    step = make_train_step(model, run_config, optimizer, lp, donate=False,
                           accum_steps=accum)
    rng = np.random.RandomState(0)
    batch_np = {
        "frames": jnp.asarray(rng.rand(batch, CTX + PRED, IMG, IMG, 3)
                              .astype(np.float32)),
        "actions": jnp.zeros((batch, CTX + PRED, 1)),
    }
    return state, step, batch_np


@pytest.mark.parametrize("k", [2, 4])
def test_accum_matches_full_batch(k):
    r"""SGD update with accum_steps=k must equal the full-batch update
    (mean of per-microbatch mean-loss grads == full mean-loss grad)."""
    state, step1, batch = _setup(1)
    _, stepk, _ = _setup(k)
    s1, m1 = step1(state, batch, jnp.asarray(0.0))
    sk, mk = stepk(state, batch, jnp.asarray(0.0))
    assert abs(float(m1["total"]) - float(mk["total"])) < 1e-4
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(sk.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(sk.step) == 1  # one optimizer step, not k


def test_accum_indivisible_batch_raises():
    state, stepk, batch = _setup(3)  # batch 8 % 3 != 0
    with pytest.raises(ValueError, match="not divisible by accum_steps"):
        stepk(state, batch, jnp.asarray(0.0))


def test_accum_model_state_advances_once():
    r"""PredRNN's scheduled-sampling schedule (training_iteration) must tick
    once per OPTIMIZER step under accumulation, not once per microbatch."""
    model = MODEL_CLASSES["predrnn-pp"](img_shape=(1, IMG, IMG), action_size=0,
                                        tensor_value_range=(0.0, 1.0),
                                        num_layers=2, num_hidden=(8, 8))
    run_config = {"context_frames": CTX, "pred_frames": PRED, "use_actions": False}
    optimizer = optax.inject_hyperparams(optax.sgd)(learning_rate=1e-3)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               context_frames=CTX, pred_frames=PRED)
    lp = PredictionLossProvider({"losses_and_scales": {"mse": 1.0}, "img_c": 1,
                                 "device": None})
    step = make_train_step(model, run_config, optimizer, lp, donate=False,
                           accum_steps=4)
    rng = np.random.RandomState(0)
    batch = {"frames": jnp.asarray(rng.rand(8, CTX + PRED, IMG, IMG, 1)
                                   .astype(np.float32)),
             "actions": jnp.zeros((8, CTX + PRED, 1))}
    new_state, _ = step(state, batch, jnp.asarray(0.0))
    before = int(state.model_state["training_iteration"])
    after = int(new_state.model_state["training_iteration"])
    assert after == before + 1
