r"""Checkpoint save/load + resume tests (the reference can't resume:
optimizer state and step counters are saved here, SURVEY.md §5.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from vp_suite_tpu.checkpoint import save_checkpoint, load_checkpoint
from vp_suite_tpu.models import MODEL_CLASSES
from vp_suite_tpu.training.train_state import create_train_state
from vp_suite_tpu.training.loop import make_train_step
from vp_suite_tpu.measure.loss_provider import PredictionLossProvider

IMG, CTX, PRED = 16, 2, 2


def _setup():
    model = MODEL_CLASSES["convlstm-shi"](img_shape=(3, IMG, IMG), action_size=0,
                                          tensor_value_range=(0.0, 1.0))
    run_config = {"context_frames": CTX, "pred_frames": PRED, "use_actions": False,
                  "lr": 1e-3}
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               context_frames=CTX, pred_frames=PRED)
    lp = PredictionLossProvider({"losses_and_scales": {"mse": 1.0}, "img_c": 3,
                                 "device": None})
    step = make_train_step(model, run_config, optimizer, lp, donate=False)
    rng = np.random.RandomState(0)
    batch = {"frames": jnp.asarray(rng.rand(2, CTX + PRED, IMG, IMG, 3).astype(np.float32)),
             "actions": jnp.zeros((2, CTX + PRED, 1))}
    return model, optimizer, state, step, batch, run_config


def test_checkpoint_roundtrip_with_opt_state(tmp_path):
    model, optimizer, state, step, batch, run_config = _setup()
    state, _ = step(state, batch, jnp.asarray(0.0))
    state, _ = step(state, batch, jnp.asarray(0.0))
    save_checkpoint(tmp_path / "ckpt", state, "convlstm-shi", model.config, run_config)
    model2, state2, model_id = load_checkpoint(tmp_path / "ckpt", run_config=run_config)
    assert model_id == "convlstm-shi"
    assert int(state2.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(state2.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_resume_training_continues_identically(tmp_path):
    r"""Training 2 steps, checkpointing, then 1 more step must equal training
    3 uninterrupted steps (exact resume incl. rng/opt/schedule state)."""
    model, optimizer, state, step, batch, run_config = _setup()
    s = state
    for _ in range(2):
        s, _ = step(s, batch, jnp.asarray(0.0))
    save_checkpoint(tmp_path / "ckpt", s, "convlstm-shi", model.config, run_config)
    s_direct, _ = step(s, batch, jnp.asarray(0.0))

    _, s_resumed, _ = load_checkpoint(tmp_path / "ckpt", run_config=run_config)
    s_resumed, _ = step(s_resumed, batch, jnp.asarray(0.0))
    for a, b in zip(jax.tree_util.tree_leaves(s_direct.params),
                    jax.tree_util.tree_leaves(s_resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert int(s_direct.step) == int(s_resumed.step) == 3
