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


def test_orbax_roundtrip_preserves_sharded_state(tmp_path):
    r"""Orbax backend: an FSDP-sharded TrainState saved on the 8-device mesh
    restores with (a) identical values and (b) the SAME shardings — no
    replicated detour through host RAM."""
    from vp_suite_tpu.checkpoint.orbax_backend import (
        save_checkpoint_orbax, restore_checkpoint_orbax)
    from vp_suite_tpu.parallel.mesh import (make_mesh, shard_params,
                                            shard_params_fsdp)
    model, optimizer, state, step, batch, run_config = _setup()
    state, _ = step(state, batch, jnp.asarray(0.0))
    mesh = make_mesh(8)
    state = state.replace(
        params=shard_params_fsdp(state.params, mesh, min_size=1024),
        opt_state=shard_params_fsdp(state.opt_state, mesh, min_size=1024),
        extra_vars=shard_params(state.extra_vars, mesh))

    save_checkpoint_orbax(tmp_path / "ckpt", state, "convlstm-shi",
                          model.config, run_config)
    restored = restore_checkpoint_orbax(tmp_path / "ckpt", state)

    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(state.params),
            jax.tree_util.tree_leaves_with_path(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert a.sharding == b.sharding, jax.tree_util.keystr(ka)
    assert int(restored.step) == 1
    # at least one leaf actually restored sharded (1/8th per device)
    sharded = [v for v in jax.tree_util.tree_leaves(restored.params)
               if not v.sharding.is_fully_replicated]
    assert sharded and sharded[0].addressable_shards[0].data.size \
        == sharded[0].size // 8


def test_orbax_full_load_and_resume(tmp_path):
    r"""load_checkpoint_orbax reconstructs model + state from disk alone and
    training resumes identically (same contract as the msgpack backend)."""
    from vp_suite_tpu.checkpoint.orbax_backend import (
        save_checkpoint_orbax, load_checkpoint_orbax)
    model, optimizer, state, step, batch, run_config = _setup()
    s = state
    for _ in range(2):
        s, _ = step(s, batch, jnp.asarray(0.0))
    save_checkpoint_orbax(tmp_path / "ckpt", s, "convlstm-shi", model.config,
                          run_config)
    s_direct, _ = step(s, batch, jnp.asarray(0.0))

    model2, s_resumed, model_id = load_checkpoint_orbax(
        tmp_path / "ckpt", run_config=run_config)
    assert model_id == "convlstm-shi"
    s_resumed, _ = step(s_resumed, batch, jnp.asarray(0.0))
    for a, b in zip(jax.tree_util.tree_leaves(s_direct.params),
                    jax.tree_util.tree_leaves(s_resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    assert int(s_direct.step) == int(s_resumed.step) == 3


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
