r"""User-facing torch-checkpoint migration oracles.

Each case builds the torch reference model, runs
``vp_suite_tpu.utils.torch_import`` on its plain ``state_dict()`` (the
user-facing path — no live-module access, unlike the impl-match tier's
hand-written converters), and asserts the imported JAX model reproduces the
reference predictions within 1e-4. This independently re-proves every
weight-layout rule through the public API, including the AC variants.

Reference save format being migrated: pickled torch modules
(``vp_suite/vpsuite.py:394,424``); see also ``VPSuite.load_torch_model``.
"""
import importlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from helpers.ref_loader import load_reference  # noqa: E402

ATOL = 1e-4


def _ref_cls(module, name):
    load_reference()
    return getattr(importlib.import_module(module), name)


def _roundtrip(model_id, ref, our_kwargs, x, pred_frames, actions=None,
               extra_our_kwargs=None):
    r"""state_dict -> import_state_dict -> prediction equivalence."""
    from vp_suite_tpu.models import MODEL_CLASSES
    from vp_suite_tpu.utils.torch_import import import_state_dict

    ref.eval()
    variables = import_state_dict(model_id, ref.state_dict())
    ours = MODEL_CLASSES[model_id](**{**our_kwargs, **(extra_our_kwargs or {})})

    xt = torch.tensor(x).permute(0, 1, 4, 2, 3)
    tkw = {} if actions is None else {"actions": torch.tensor(actions)}
    jkw = {} if actions is None else {"actions": jnp.asarray(actions)}
    with torch.no_grad():
        preds_ref, _ = ref(xt, pred_frames=pred_frames, **tkw)
    with jax.default_matmul_precision("highest"):
        preds, _ = ours.apply(variables, jnp.asarray(x),
                              pred_frames=pred_frames, **jkw)
    diff = np.abs(np.asarray(preds).transpose(0, 1, 4, 2, 3)
                  - preds_ref.detach().numpy()).max()
    assert diff < ATOL, f"torch-import {model_id} mismatch: {diff}"


def test_import_ef_conv_lstm():
    Ref = _ref_cls("vp_suite.models.precipitation_nowcasting.ef_conv_lstm",
                   "EF_ConvLSTM")
    torch.manual_seed(0)
    img = 32
    kwargs = dict(img_shape=(3, img, img), action_size=0,
                  tensor_value_range=(0.0, 1.0))
    x = np.random.default_rng(0).standard_normal((2, 4, img, img, 3)).astype(np.float32)
    _roundtrip("convlstm-shi", Ref("cpu", **kwargs), kwargs, x, 3)


def test_import_ef_traj_gru():
    Ref = _ref_cls("vp_suite.models.precipitation_nowcasting.ef_traj_gru",
                   "EF_TrajGRU")
    torch.manual_seed(0)
    img = 32
    kwargs = dict(img_shape=(3, img, img), action_size=0,
                  tensor_value_range=(0.0, 1.0))
    x = np.random.default_rng(0).standard_normal((1, 4, img, img, 3)).astype(np.float32)
    _roundtrip("trajgru", Ref("cpu", **kwargs), kwargs, x, 2)


@pytest.mark.parametrize("layer_norm", [False, True])
def test_import_predrnn(layer_norm):
    Ref = _ref_cls("vp_suite.models.predrnn_v2", "PredRNN_V2")
    torch.manual_seed(0)
    img = 16
    kwargs = dict(img_shape=(3, img, img), action_size=0,
                  tensor_value_range=(0.0, 1.0))
    ref = Ref("cpu", layer_norm=layer_norm, num_hidden=[32, 32, 32, 32], **kwargs)
    x = np.random.default_rng(0).standard_normal((2, 5, img, img, 3)).astype(np.float32)
    _roundtrip("predrnn-pp", ref, kwargs, x, 2,
               extra_our_kwargs=dict(layer_norm=layer_norm,
                                     num_hidden=(32, 32, 32, 32)))


def test_import_predrnn_ac():
    Ref = _ref_cls("vp_suite.models.predrnn_v2", "PredRNN_V2")
    torch.manual_seed(0)
    img, a = 32, 3
    kwargs = dict(img_shape=(3, img, img), action_size=a,
                  tensor_value_range=(0.0, 1.0), action_conditional=True)
    ref = Ref("cpu", num_hidden=[16, 16, 16, 16], **kwargs)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, img, img, 3)).astype(np.float32)
    actions = rng.standard_normal((2, 5, a)).astype(np.float32)
    _roundtrip("predrnn-pp", ref, kwargs, x, 2, actions=actions,
               extra_our_kwargs=dict(num_hidden=(16, 16, 16, 16)))


@pytest.mark.parametrize("ac", [False, True])
def test_import_unet3d(ac):
    Ref = _ref_cls("vp_suite.models.unet3d", "UNet3D")
    torch.manual_seed(0)
    img, td, a = 32, 3, 2
    kwargs = dict(img_shape=(3, img, img), action_size=a if ac else 0,
                  tensor_value_range=(0.0, 1.0), temporal_dim=td)
    if ac:
        kwargs["action_conditional"] = True
    ref = Ref("cpu", **kwargs)
    with torch.no_grad():  # make eval-mode BN normalization non-trivial
        for mod in ref.modules():
            if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, td, img, img, 3)).astype(np.float32)
    actions = rng.standard_normal((2, td + 2, a)).astype(np.float32) if ac else None
    _roundtrip("unet-3d", ref, kwargs, x, 2, actions=actions)


@pytest.mark.parametrize("ac", [False, True])
def test_import_phydnet(ac):
    Ref = _ref_cls("vp_suite.models.phydnet", "PhyDNet")
    torch.manual_seed(0)
    img, a = 64, 2
    kwargs = dict(img_shape=(1, img, img), action_size=a if ac else 0,
                  tensor_value_range=(0.0, 1.0))
    if ac:
        kwargs["action_conditional"] = True
    ref = Ref("cpu", **kwargs)
    rng = np.random.default_rng(0)
    x = rng.random((2, 3, img, img, 1)).astype(np.float32)
    actions = rng.standard_normal((2, 4, a)).astype(np.float32) if ac else None
    _roundtrip("phy", ref, kwargs, x, 2, actions=actions)


@pytest.mark.parametrize("ac", [False, True])
def test_import_st_phy(ac):
    Ref = _ref_cls("vp_suite.models.st_phy", "STPhy")
    torch.manual_seed(0)
    img, a = 64, 2
    kwargs = dict(img_shape=(3, img, img), action_size=a if ac else 0,
                  tensor_value_range=(0.0, 1.0))
    if ac:
        kwargs["action_conditional"] = True
    ref = Ref("cpu", **kwargs)
    rng = np.random.default_rng(0)
    x = rng.random((1, 3, img, img, 3)).astype(np.float32)
    actions = rng.standard_normal((1, 4, a)).astype(np.float32) if ac else None
    _roundtrip("st-phy", ref, kwargs, x, 2, actions=actions)


def test_import_lstm_structure():
    r"""The reference LSTM's cells are unregistered + untrained
    (``vp_suite/models/lstm.py:46-49``) and our implementation intentionally
    fixes its broken recurrence, so prediction equivalence is out of scope —
    the importer contract is: every mappable weight lands on the right leaf
    with the right layout."""
    Ref = _ref_cls("vp_suite.models.lstm", "LSTM")
    torch.manual_seed(0)
    img = 16
    kwargs = dict(img_shape=(3, img, img), action_size=0,
                  tensor_value_range=(0.0, 1.0))
    ref = Ref("cpu", **kwargs)

    from vp_suite_tpu.models import MODEL_CLASSES
    from vp_suite_tpu.utils.torch_import import import_torch_model
    model_id, our_kwargs, variables = import_torch_model(ref)
    assert model_id == "lstm"
    model = MODEL_CLASSES[model_id](**our_kwargs)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 2, img, img, 3)), pred_frames=1)
    init_shapes = jax.tree_util.tree_map(jnp.shape, init["params"])
    got_shapes = jax.tree_util.tree_map(jnp.shape, variables["params"])
    assert init_shapes == got_shapes
    # spot-check a layout: enc1 conv [out,in,kh,kw] -> [kh,kw,in,out]
    np.testing.assert_allclose(
        np.asarray(variables["params"]["enc1_kernel"]),
        ref.enc1.weight.detach().numpy().transpose(2, 3, 1, 0))
    # cells came from the pickled plain list, not state_dict
    assert "lstm0_w_ih" in variables["params"]


def test_facade_load_torch_model(tmp_path):
    r"""End-to-end migration: the reference's pickled-module checkpoint
    (``vpsuite.py:394``) loads through ``VPSuite.load_torch_model`` and
    predicts identically to the torch original."""
    Ref = _ref_cls("vp_suite.models.precipitation_nowcasting.ef_conv_lstm",
                   "EF_ConvLSTM")
    torch.manual_seed(0)
    img = 32
    ref = Ref("cpu", img_shape=(3, img, img), action_size=0,
              tensor_value_range=(0.0, 1.0))
    ref.eval()
    torch.save(ref, tmp_path / "best_model.pth")

    from vp_suite_tpu import VPSuite
    suite = VPSuite(device="cpu")
    entry = suite.load_torch_model(str(tmp_path))
    assert entry.model_id == "convlstm-shi"

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 4, img, img, 3)).astype(np.float32)
    with torch.no_grad():
        preds_ref, _ = ref(torch.tensor(x).permute(0, 1, 4, 2, 3), pred_frames=2)
    with jax.default_matmul_precision("highest"):
        preds, _ = entry.model.apply(
            {"params": entry.state.params, **entry.state.extra_vars},
            jnp.asarray(x), pred_frames=2)
    diff = np.abs(np.asarray(preds).transpose(0, 1, 4, 2, 3)
                  - preds_ref.detach().numpy()).max()
    assert diff < ATOL, f"facade torch migration mismatch: {diff}"
