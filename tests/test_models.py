r"""Registry-parametrized model shape tests.

Parity with the reference tier (``tests/test_models.py:18-60``): every model
in the registry is built with a canonical config and must produce correctly
shaped single- and multi-frame predictions, in non-action and (where
supported) action-conditional modes. Adding a model to the registry
automatically adds it to these tests.

Smaller canonical images (32x32) than the reference (64x64) keep the CPU
test-suite runtime reasonable; shapes exercise the same code paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vp_suite_tpu.models import MODEL_CLASSES

IMG = 32
CFG = dict(img_shape=(3, IMG, IMG), action_size=3, tensor_value_range=(0.0, 1.0))
B, CTX, PRED = 2, 4, 5


def _build(model_id, **extra):
    cls = MODEL_CLASSES[model_id]
    kwargs = dict(CFG)
    if model_id == "unet-3d":
        kwargs["temporal_dim"] = 3
    kwargs.update(extra)
    return cls(**kwargs)


def _run(model, pred_frames, actions=None):
    t_in = CTX + pred_frames if model.NEEDS_COMPLETE_INPUT else CTX
    x = jnp.asarray(np.random.rand(B, t_in, IMG, IMG, 3).astype(np.float32))
    kwargs = {}
    if actions is not None:
        kwargs["actions"] = actions
    if not model.TRAINABLE:
        return model.apply({}, x, pred_frames=pred_frames, **kwargs)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           pred_frames=pred_frames, **kwargs)
    return model.apply(variables, x, pred_frames=pred_frames, **kwargs)


@pytest.mark.parametrize("model_id", list(MODEL_CLASSES.keys()))
def test_model_forward_shapes(model_id):
    model = _build(model_id)
    preds, aux = _run(model, PRED)
    assert preds.shape == (B, PRED, IMG, IMG, 3)
    assert jnp.all(jnp.isfinite(preds))
    preds1, _ = _run(model, 1)
    assert preds1.shape == (B, 1, IMG, IMG, 3)


@pytest.mark.parametrize("model_id",
                         [k for k, c in MODEL_CLASSES.items() if c.CAN_HANDLE_ACTIONS])
def test_model_forward_shapes_action_conditional(model_id):
    model = _build(model_id, action_conditional=True)
    t_in = CTX + PRED if model.NEEDS_COMPLETE_INPUT else CTX
    actions = jnp.asarray(np.random.rand(B, CTX + PRED, 3).astype(np.float32))
    preds, aux = _run(model, PRED, actions=actions)
    assert preds.shape == (B, PRED, IMG, IMG, 3)
    assert jnp.all(jnp.isfinite(preds))


@pytest.mark.parametrize("model_id", list(MODEL_CLASSES.keys()))
def test_model_config_roundtrip(model_id):
    r"""model.config must reconstruct an equivalent model via the registry
    (checkpoint reconstruction path)."""
    from vp_suite_tpu.checkpoint import model_from_config
    model = _build(model_id)
    cfg = model.config
    assert cfg["NAME"] == model.NAME
    assert cfg["img_h"] == IMG
    model2 = model_from_config(model_id, cfg)
    assert model2.img_shape == model.img_shape


def test_gradients_flow():
    r"""Gradients through the flagship scan are finite and nonzero."""
    model = _build("convlstm-shi")
    x = jnp.asarray(np.random.rand(B, CTX, IMG, IMG, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, pred_frames=2)

    def loss(v):
        preds, _ = model.apply(v, x, pred_frames=2)
        return jnp.mean(preds ** 2)

    g = jax.grad(loss)(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.parametrize("model_id", ["convlstm-shi", "trajgru"])
@pytest.mark.parametrize("flags", [dict(interleaved_forecast=True),
                                   dict(interleaved_encode=True),
                                   dict(interleaved_forecast=True,
                                        interleaved_encode=True)])
def test_ef_interleaved_matches_staged(model_id, flags):
    r"""The interleaved encoder/forecaster (per-step loops, layout-copy
    killers — see ef_blocks.EncoderForecasterBase.interleaved_forecast /
    interleaved_encode) must be numerically identical to the staged
    per-stage-batched form."""
    # force-staged baseline: the flags default to None = auto, which resolves
    # to interleaved at these short test sequences — without the explicit
    # False the "staged" model would silently be interleaved too
    staged = _build(model_id, interleaved_forecast=False,
                    interleaved_encode=False)
    inter = _build(model_id, **flags)
    x = jnp.asarray(np.random.rand(B, CTX, IMG, IMG, 3).astype(np.float32))
    variables = staged.init({"params": jax.random.PRNGKey(0)}, x, pred_frames=PRED)
    p_staged, _ = staged.apply(variables, x, pred_frames=PRED)
    p_inter, _ = inter.apply(variables, x, pred_frames=PRED)
    np.testing.assert_allclose(np.asarray(p_staged), np.asarray(p_inter),
                               rtol=0, atol=1e-5)


def test_ef_interleave_auto_rule():
    r"""The None = auto interleave default (round-5 TPU A/B winner) must
    resolve: ON inside the <=20-step full-unroll regime without zoneout,
    OFF beyond the cap, OFF when any rnn block draws zoneout masks."""
    x = jnp.asarray(np.random.rand(B, CTX, IMG, IMG, 3).astype(np.float32))

    def resolve(m, n_steps):
        variables = m.init({"params": jax.random.PRNGKey(0),
                            "zoneout": jax.random.PRNGKey(1)}, x, pred_frames=2)
        bound = m.bind(variables, rngs={"zoneout": jax.random.PRNGKey(1)})
        return bound._resolve_interleave(m.interleaved_forecast,
                                         bound.dec_rnns_list, n_steps)

    model = _build("trajgru")
    assert model.interleaved_forecast is None   # default is auto
    assert resolve(model, 10) is True
    assert resolve(model, 21) is False          # beyond the full-unroll cap
    zo = _build("trajgru", dec_rnn_z=(0.1, 0.1, 0.1))
    assert resolve(zo, 10) is False             # zoneout breaks rng parity
    forced = _build("trajgru", interleaved_forecast=True,
                    dec_rnn_z=(0.1, 0.1, 0.1))
    assert resolve(forced, 999) is True         # explicit flag always wins


def test_ef_rejects_wrong_output_size():
    r"""EF conv arithmetic validation (parity: ef_blocks.py:161-167): an image
    size the conv stack can't reproduce must raise at init."""
    cls = MODEL_CLASSES["convlstm-shi"]
    model = cls(img_shape=(3, 30, 30), action_size=0, tensor_value_range=(0.0, 1.0))
    with pytest.raises(AttributeError, match="wrong output size"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 30, 30, 3)), pred_frames=1)


def test_lstm_rejects_wrong_image_size():
    model = _build("lstm")
    with pytest.raises(ValueError, match="does not match"):
        x = jnp.zeros((1, 2, IMG * 2, IMG * 2, 3))
        model.init(jax.random.PRNGKey(0), x, pred_frames=1)


def test_predrnn_requires_complete_input():
    model = _build("predrnn-pp")
    x = jnp.zeros((1, 1, IMG, IMG, 3))
    with pytest.raises(ValueError, match="include"):
        model.init(jax.random.PRNGKey(0), x, pred_frames=1)


def test_doc_tables_generate(tmp_path):
    # import by file path: the impl-match tests put the reference repo on
    # sys.path, whose own 'docs' package would shadow ours by name
    import importlib.util
    from pathlib import Path
    path = Path(__file__).resolve().parents[1] / "docs" / "build_doc_tables.py"
    spec = importlib.util.spec_from_file_location("vpt_build_doc_tables", path)
    bdt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bdt)
    assert "convlstm-shi" in bdt.model_table()
    assert "MMF" in bdt.dataset_table()
    assert "fvd" in bdt.measure_table()


def test_trajgru_zoneout():
    r"""zoneout keeps the previous hidden state per channel (intended
    semantics; the reference's branch is inert — see traj_gru.py docstring).
    z=1 must freeze the state entirely; z=0 (default) is the plain path."""
    from vp_suite_tpu.model_blocks.traj_gru import TrajGRU
    x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 16, 16, 3).astype(np.float32))
    cell = TrajGRU(in_channels=3, enc_channels=8, state_h=16, state_w=16)
    v = cell.init({"params": jax.random.PRNGKey(0)}, x, None, 4)
    out0, _ = cell.apply(v, x, None, 4)
    assert float(jnp.abs(out0).max()) > 0
    frozen = TrajGRU(in_channels=3, enc_channels=8, state_h=16, state_w=16,
                     zoneout=1.0)
    out1, _ = frozen.apply(v, x, None, 4, rngs={"zoneout": jax.random.PRNGKey(1)})
    assert float(jnp.abs(out1).max()) == 0.0


def test_api_docs_generate(tmp_path, monkeypatch):
    r"""The offline API-doc generator must produce a page per module and an
    index (sphinx substitute; reference docs/assemble_docs.sh parity)."""
    import importlib.util
    from pathlib import Path
    path = Path(__file__).resolve().parents[1] / "docs" / "build_api_docs.py"
    spec = importlib.util.spec_from_file_location("vpt_build_api_docs", path)
    bad = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bad)
    monkeypatch.setattr(bad, "API_DIR", tmp_path)
    bad.main()
    pages = sorted(p.name for p in tmp_path.glob("*.md"))
    assert "index.md" in pages
    assert "vp_suite_tpu_vpsuite.md" in pages
    body = (tmp_path / "vp_suite_tpu_ops_grid_sample.md").read_text()
    assert "warp_flow_multi" in body and "import failed" not in body
    assert len(pages) > 40
