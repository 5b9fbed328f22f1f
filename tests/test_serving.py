r"""AOT export/serving tests: the StableHLO artifact must reproduce the
in-process predictions bit-for-bit and be loadable from bytes alone (no
model class, no checkpoint on the serving side)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vp_suite_tpu.models import MODEL_CLASSES
from vp_suite_tpu.serving import (export_predictor, save_predictor,
                                  load_predictor)
from vp_suite_tpu.training.train_state import create_train_state
from vp_suite_tpu.training.loop import _apply_model

IMG, CTX, PRED, B = 16, 2, 3, 2


def _setup(model_id="convlstm-shi", **kw):
    model = MODEL_CLASSES[model_id](img_shape=(3, IMG, IMG), action_size=0,
                                    tensor_value_range=(0.0, 1.0), **kw)
    optimizer = optax.adam(1e-3)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               context_frames=CTX, pred_frames=PRED)
    return model, state


def test_export_roundtrip_matches_in_process(tmp_path):
    model, state = _setup()
    exported = export_predictor(model, state, CTX, PRED, batch_size=B)
    path = save_predictor(exported, tmp_path / "predictor.stablehlo")
    assert path.stat().st_size > 0

    predict = load_predictor(path)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, CTX, IMG, IMG, 3), jnp.float32)

    (ref, _), _ = _apply_model(model, state.params, state.extra_vars, x,
                               pred_frames=PRED, train=False)
    out = predict(x)
    assert out.shape == (B, PRED, IMG, IMG, 3)
    np.testing.assert_allclose(np.asarray(ref, np.float32), np.asarray(out),
                               atol=1e-6)


def test_export_needs_complete_input_model(tmp_path):
    r"""NEEDS_COMPLETE_INPUT models (PredRNN) consume the full ctx+pred
    window; the exported signature reflects that."""
    model, state = _setup("predrnn-pp", num_layers=2, num_hidden=(8, 8))
    exported = export_predictor(model, state, CTX, PRED, batch_size=B)
    predict = load_predictor(save_predictor(exported, tmp_path / "p.stablehlo"))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(B, CTX + PRED, IMG, IMG, 3), jnp.float32)
    out = predict(x)
    assert out.shape[:2] == (B, PRED)
    assert np.isfinite(np.asarray(out)).all()


def test_export_batch_polymorphic(tmp_path):
    r"""batch_size=None exports one artifact with a symbolic leading dim;
    it must serve several batch sizes and match the in-process forward."""
    model, state = _setup()
    exported = export_predictor(model, state, CTX, PRED, batch_size=None)
    predict = load_predictor(save_predictor(exported,
                                            tmp_path / "poly.stablehlo"))
    rng = np.random.RandomState(5)
    for b in (1, 3):
        x = jnp.asarray(rng.rand(b, CTX, IMG, IMG, 3), jnp.float32)
        (ref, _), _ = _apply_model(model, state.params, state.extra_vars, x,
                                   pred_frames=PRED, train=False)
        out = predict(x)
        assert out.shape == (b, PRED, IMG, IMG, 3)
        np.testing.assert_allclose(np.asarray(ref, np.float32),
                                   np.asarray(out), atol=1e-5)


def test_export_action_conditional(tmp_path):
    r"""Action-conditional artifacts take (frames, actions) and must match
    the in-process forward."""
    model = MODEL_CLASSES["lstm"](img_shape=(3, IMG, IMG), action_size=2,
                                  tensor_value_range=(0.0, 1.0),
                                  action_conditional=True)
    optimizer = optax.adam(1e-3)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               context_frames=CTX, pred_frames=PRED)
    exported = export_predictor(model, state, CTX, PRED, batch_size=B)
    predict = load_predictor(save_predictor(exported, tmp_path / "ac.hlo"))
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.rand(B, CTX, IMG, IMG, 3), jnp.float32)
    a = jnp.asarray(rng.rand(B, CTX + PRED, 2), jnp.float32)
    (ref, _), _ = _apply_model(model, state.params, state.extra_vars, x,
                               pred_frames=PRED, train=False, actions=a)
    out = predict(x, a)
    assert out.shape == (B, PRED, IMG, IMG, 3)
    np.testing.assert_allclose(np.asarray(ref, np.float32), np.asarray(out),
                               atol=1e-5)
    # actions actually matter: different actions -> different predictions
    out2 = predict(x, a + 1.0)
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-6


def test_export_bf16_compute_dtype(tmp_path):
    r"""compute_dtype=bfloat16 bakes a mixed-precision serving graph; output
    stays float32 and tracks the f32 export within bf16 tolerance."""
    model, state = _setup()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(B, CTX, IMG, IMG, 3), jnp.float32)
    f32 = load_predictor(save_predictor(
        export_predictor(model, state, CTX, PRED, batch_size=B),
        tmp_path / "f32.stablehlo"))(x)
    bf16 = load_predictor(save_predictor(
        export_predictor(model, state, CTX, PRED, batch_size=B,
                         compute_dtype=jnp.bfloat16),
        tmp_path / "bf16.stablehlo"))(x)
    assert bf16.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(f32 - bf16))) < 0.05  # bf16 has ~3 digits
    assert float(jnp.max(jnp.abs(f32 - bf16))) > 0.0  # really ran in bf16


def test_facade_export(tmp_path):
    from vp_suite_tpu import VPSuite
    suite = VPSuite(device="cpu")
    suite.load_dataset("MMF", img_size=IMG, digit_source="synthetic", n_seqs=8)
    suite.create_model("convlstm-shi")
    path = suite.export_model(tmp_path / "m.stablehlo", context_frames=CTX,
                              pred_frames=PRED, batch_size=1)
    predict = load_predictor(path)
    out = predict(jnp.zeros((1, CTX, IMG, IMG, 3), jnp.float32))
    assert out.shape == (1, PRED, IMG, IMG, 3)


def test_export_without_model_raises():
    from vp_suite_tpu import VPSuite
    suite = VPSuite(device="cpu")
    with pytest.raises(ValueError, match="No model"):
        suite.export_model("/tmp/x.stablehlo", context_frames=2, pred_frames=2)


def test_facade_predict_api():
    r"""suite.predict: direct array-in/array-out inference (batched and
    single-sequence forms); the jitted predictor is cached per signature."""
    from vp_suite_tpu import VPSuite
    suite = VPSuite(device="cpu")
    suite.load_dataset("MMF", img_size=IMG, digit_source="synthetic", n_seqs=8)
    suite.create_model("convlstm-shi")
    rng = np.random.RandomState(3)
    x = rng.rand(2, CTX, IMG, IMG, 3).astype(np.float32)
    preds = suite.predict(x, pred_frames=PRED)
    assert preds.shape == (2, PRED, IMG, IMG, 3)
    single = suite.predict(x[0], pred_frames=PRED)
    assert single.shape == (PRED, IMG, IMG, 3)
    np.testing.assert_allclose(np.asarray(preds[0]), np.asarray(single),
                               atol=1e-6)
    # same (ctx, horizon) signature reuses one jitted predictor
    assert len(suite.models[-1]._predict_fns) == 1
    suite.predict(x, pred_frames=PRED + 1)
    assert len(suite.models[-1]._predict_fns) == 2
    with pytest.raises(ValueError, match="context frames"):
        suite.predict(x[:, :0], pred_frames=PRED)


def test_facade_predict_context_only_for_complete_input_models():
    r"""Uniform semantics: predict() takes CONTEXT frames for every model;
    NEEDS_COMPLETE_INPUT models (PredRNN) get the window zero-padded
    internally, so the returned frames are the FUTURE horizon."""
    from vp_suite_tpu import VPSuite
    suite = VPSuite(device="cpu")
    suite.load_dataset("MMF", img_size=IMG, digit_source="synthetic", n_seqs=8)
    suite.create_model("predrnn-pp", num_layers=2, num_hidden=(8, 8))
    rng = np.random.RandomState(4)
    x = rng.rand(1, CTX, IMG, IMG, 3).astype(np.float32)  # context ONLY
    preds = suite.predict(x, pred_frames=PRED)
    assert preds.shape == (1, PRED, IMG, IMG, 3)
    assert np.isfinite(np.asarray(preds)).all()
