r"""Torch -> JAX checkpoint migration for reference vp-suite users.

The reference saves trained models as pickled torch modules
(``torch.save(model)``, ``vp_suite/vpsuite.py:394,424``). A user switching to
this framework brings such checkpoints along; this module maps their weights
into our flax param pytrees so trained models keep working:

- :func:`import_state_dict` — pure name/layout mapping from a flat torch
  ``state_dict`` (str -> tensor/ndarray) to our ``variables`` dict, per model
  id. Needs neither torch nor the reference package.
- :func:`import_torch_model` — takes an UNPICKLED reference model object,
  infers the model id + constructor kwargs from its attributes and runs the
  state-dict mapping (plus the LSTM special case below).
- :func:`load_torch_checkpoint` — ``torch.load`` a reference ``*.pth`` file
  (requires torch + the reference package importable, since the reference
  pickles whole module objects) and hand it to :func:`import_torch_model`.

Layout rules (same as ``vp_suite_tpu/nn/layers.py``):
conv ``[out,in,kh,kw] -> [kh,kw,in,out]``; convT ``[in,out,kh,kw] ->
[kh,kw,in,out]``; conv3d ``[out,in,kt,kh,kw] -> [kt,kh,kw,in,out]``; linear
``[out,in] -> [in,out]``; ``LayerNorm([c,h,w])`` affine ``-> [h,w,c]``.

Known reference quirk: the LSTM model keeps its ``nn.LSTMCell`` s in a plain
Python list (``vp_suite/models/lstm.py:46-49``), so they are ABSENT from its
``state_dict`` (and were never trained — the reference optimizer never saw
them). :func:`import_torch_model` recovers whatever values the pickle holds by
attribute access; :func:`import_state_dict` maps them only when
``rnn_layers.{i}.weight_ih`` keys are present (merged by
:func:`import_torch_model`, or present if someone fixed the upstream bug).
"""
import numpy as np

__all__ = ["import_state_dict", "import_torch_model", "load_torch_checkpoint",
           "TORCH_CLASS_TO_MODEL_ID"]

#: reference torch class name -> our registry id (models/__init__.py).
TORCH_CLASS_TO_MODEL_ID = {
    "CopyLastFrame": "copy",
    "LSTM": "lstm",
    "UNet3D": "unet-3d",
    "PhyDNet": "phy",
    "STPhy": "st-phy",
    "PredRNN_V2": "predrnn-pp",
    "EF_ConvLSTM": "convlstm-shi",
    "EF_TrajGRU": "trajgru",
}


# ---------------------------------------------------------------- layout ops
def _np(x):
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv_w(x):
    return _np(x).transpose(2, 3, 1, 0)


def _convT_w(x):
    return _np(x).transpose(2, 3, 0, 1)


def _conv3d_w(x):
    return _np(x).transpose(2, 3, 4, 1, 0)


def _linear_w(x):
    return _np(x).transpose(1, 0)


def _ln_chw(x):
    return _np(x).transpose(1, 2, 0)


def _count(sd, fmt):
    r"""Number of consecutive indices i (from 0) for which ``fmt.format(i)``
    is a key."""
    i = 0
    while fmt.format(i) in sd:
        i += 1
    return i


# ------------------------------------------------------------- EF families
def _ef_stage(sd, prefix):
    r"""A reference ``_make_layers`` Sequential (``ef_blocks.py:15-49``):
    layer names carry the kind ('deconv...' = ConvTranspose2d, 'conv...' =
    Conv2d); activations hold no params."""
    names = sorted({k[len(prefix) + 1:].split(".")[0]
                    for k in sd if k.startswith(prefix + ".")})
    out = {}
    for name in names:
        w = sd[f"{prefix}.{name}.weight"]
        kern = _convT_w(w) if "deconv" in name else _conv_w(w)
        out[name] = {"kernel": kern, "bias": _np(sd[f"{prefix}.{name}.bias"])}
    return out


def _ef_convlstm_rnn(sd, p):
    return {
        "conv_kernel": _conv_w(sd[f"{p}._conv.weight"]),
        "conv_bias": _np(sd[f"{p}._conv.bias"]),
        "wci": _np(sd[f"{p}.Wci"])[0].transpose(1, 2, 0),
        "wcf": _np(sd[f"{p}.Wcf"])[0].transpose(1, 2, 0),
        "wco": _np(sd[f"{p}.Wco"])[0].transpose(1, 2, 0),
    }


def _ef_trajgru_rnn(sd, p):
    out = {}
    for name in ["i2h", "i2f_conv1", "h2f_conv1", "flows_conv", "ret"]:
        out[f"{name}_kernel"] = _conv_w(sd[f"{p}.{name}.weight"])
        out[f"{name}_bias"] = _np(sd[f"{p}.{name}.bias"])
    return out


def _import_ef(sd, rnn_fn):
    blocks = 0
    while f"encoder.rnn{blocks + 1}._conv.weight" in sd \
            or f"encoder.rnn{blocks + 1}.i2h.weight" in sd:
        blocks += 1
    if blocks == 0:
        raise ValueError("no encoder.rnn{k} keys found — not an EF state_dict")
    params = {}
    # our forecaster index n+1 is the reference's rnn{blocks-n} (the reference
    # reverses names at construction, ef_blocks.py:96-98)
    for n in range(blocks):
        params[f"enc_rnn{n + 1}"] = rnn_fn(sd, f"encoder.rnn{n + 1}")
        params[f"enc_stage{n + 1}"] = _ef_stage(sd, f"encoder.stage{n + 1}")
        params[f"dec_rnn{n + 1}"] = rnn_fn(sd, f"forecaster.rnn{blocks - n}")
        params[f"dec_stage{n + 1}"] = _ef_stage(sd, f"forecaster.stage{blocks - n}")
    return {"params": params}


# --------------------------------------------------------------- PredRNN-V2
def _import_predrnn(sd):
    n = _count(sd, "cell_list.{}.conv_x.0.weight")
    ac = "cell_list.0.conv_a.0.weight" in sd
    layer_norm = "cell_list.0.conv_x.1.weight" in sd
    conv_names = ["conv_x", "conv_h", "conv_a", "conv_m", "conv_o"] if ac \
        else ["conv_x", "conv_h", "conv_m", "conv_o"]
    ln_keys = {"conv_x": "ln_x", "conv_h": "ln_h", "conv_a": "ln_a",
               "conv_m": "ln_m", "conv_o": "ln_o"}
    p = {}
    for i in range(n):
        for cn in conv_names:
            p[f"cell{i}_{cn}_kernel"] = _conv_w(sd[f"cell_list.{i}.{cn}.0.weight"])
            if f"cell_list.{i}.{cn}.0.bias" in sd:
                p[f"cell{i}_{cn}_bias"] = _np(sd[f"cell_list.{i}.{cn}.0.bias"])
            if layer_norm:
                p[f"cell{i}_{ln_keys[cn]}_scale"] = _ln_chw(sd[f"cell_list.{i}.{cn}.1.weight"])
                p[f"cell{i}_{ln_keys[cn]}_bias"] = _ln_chw(sd[f"cell_list.{i}.{cn}.1.bias"])
        p[f"cell{i}_conv_last_kernel"] = _conv_w(sd[f"cell_list.{i}.conv_last.weight"])
        if f"cell_list.{i}.conv_last.bias" in sd:
            p[f"cell{i}_conv_last_bias"] = _np(sd[f"cell_list.{i}.conv_last.bias"])
    if ac:
        for name in ["conv_input1", "conv_input2",
                     "action_conv_input1", "action_conv_input2"]:
            p[f"{name}_kernel"] = _conv_w(sd[f"{name}.weight"])
        for name in ["deconv_output1", "deconv_output2"]:
            p[f"{name}_kernel"] = _convT_w(sd[f"{name}.weight"])
    else:
        p["conv_last_kernel"] = _conv_w(sd["conv_last.weight"])
    p["adapter_kernel"] = _conv_w(sd["adapter.weight"])
    return {"params": p}


# ------------------------------------------------------------------ UNet-3D
def _import_unet3d(sd):
    r"""Maps to the merged time-in-channels UNet-3D (param layouts unchanged
    from the reference NDCHW module; ``models/unet3d.py``). BatchNorm running
    statistics land in ``batch_stats``."""
    params, stats = {}, {}

    def put_double(name, prefix, three_d):
        cw = _conv3d_w if three_d else _conv_w
        params[name] = {
            "conv1": {"kernel": cw(sd[f"{prefix}.conv.0.weight"])},
            "bn1": {"scale": _np(sd[f"{prefix}.conv.1.weight"]),
                    "bias": _np(sd[f"{prefix}.conv.1.bias"])},
            "conv2": {"kernel": cw(sd[f"{prefix}.conv.3.weight"])},
            "bn2": {"scale": _np(sd[f"{prefix}.conv.4.weight"]),
                    "bias": _np(sd[f"{prefix}.conv.4.bias"])},
        }
        stats[name] = {
            "bn1": {"mean": _np(sd[f"{prefix}.conv.1.running_mean"]),
                    "var": _np(sd[f"{prefix}.conv.1.running_var"])},
            "bn2": {"mean": _np(sd[f"{prefix}.conv.4.running_mean"]),
                    "var": _np(sd[f"{prefix}.conv.4.running_var"])},
        }

    n_down = _count(sd, "downs.{}.conv.0.weight")
    for i in range(n_down):
        put_double(f"down{i}", f"downs.{i}", three_d=True)
        params[f"time3d_{i}"] = {"kernel": _conv3d_w(sd[f"time3ds.{i}.weight"]),
                                 "bias": _np(sd[f"time3ds.{i}.bias"])}
        if f"action_inflates.{i}.weight" in sd:
            params[f"action_inflate{i}"] = {
                "kernel": _linear_w(sd[f"action_inflates.{i}.weight"]),
                "bias": _np(sd[f"action_inflates.{i}.bias"])}
    # the reference appends one extra time3d used before the bottleneck
    params["time3d_bn"] = {"kernel": _conv3d_w(sd[f"time3ds.{n_down}.weight"]),
                           "bias": _np(sd[f"time3ds.{n_down}.bias"])}
    if "bottleneck_action_inflate.weight" in sd:
        params["bottleneck_action_inflate"] = {
            "kernel": _linear_w(sd["bottleneck_action_inflate.weight"]),
            "bias": _np(sd["bottleneck_action_inflate.bias"])}
    put_double("bottleneck", "bottleneck", three_d=False)
    i = 0  # ups alternate [convT, DoubleConv2d, convT, ...]; only the convT
    while f"ups.{i}.weight" in sd:  # has a direct .weight key
        params[f"up_t{i // 2}"] = {"kernel": _convT_w(sd[f"ups.{i}.weight"]),
                                   "bias": _np(sd[f"ups.{i}.bias"])}
        put_double(f"up_c{i // 2}", f"ups.{i + 1}", three_d=False)
        i += 2
    params["final_conv"] = {"kernel": _conv_w(sd["final_conv.weight"]),
                            "bias": _np(sd["final_conv.bias"])}
    return {"params": params, "batch_stats": stats}


# ------------------------------------------------------------------ PhyDNet
def _dcgan(p, name, prefix, sd, transposed):
    r"""A reference DCGANConv/DCGANConvT block: ``.main`` = [conv, GroupNorm,
    activation] (``model_blocks/enc.py``)."""
    w = _convT_w if transposed else _conv_w
    p[f"{name}_conv_kernel"] = w(sd[f"{prefix}.main.0.weight"])
    p[f"{name}_conv_bias"] = _np(sd[f"{prefix}.main.0.bias"])
    p[f"{name}_gn_scale"] = _np(sd[f"{prefix}.main.1.weight"])
    p[f"{name}_gn_bias"] = _np(sd[f"{prefix}.main.1.bias"])


def _phycell(p, name, prefix, sd):
    r"""A reference PhyCell_Cell: F = conv1/bn1(GroupNorm)/conv2, plus the
    convgate; AC checkpoints add frame/hidden action convs
    (``model_blocks/phydnet.py``)."""
    p[f"{name}_F_conv1_kernel"] = _conv_w(sd[f"{prefix}.F.conv1.weight"])
    p[f"{name}_F_conv1_bias"] = _np(sd[f"{prefix}.F.conv1.bias"])
    p[f"{name}_F_bn1_scale"] = _np(sd[f"{prefix}.F.bn1.weight"])
    p[f"{name}_F_bn1_bias"] = _np(sd[f"{prefix}.F.bn1.bias"])
    p[f"{name}_F_conv2_kernel"] = _conv_w(sd[f"{prefix}.F.conv2.weight"])
    p[f"{name}_F_conv2_bias"] = _np(sd[f"{prefix}.F.conv2.bias"])
    p[f"{name}_convgate_kernel"] = _conv_w(sd[f"{prefix}.convgate.weight"])
    p[f"{name}_convgate_bias"] = _np(sd[f"{prefix}.convgate.bias"])
    for extra in ["frame_action_conv", "hidden_action_conv"]:
        if f"{prefix}.{extra}.weight" in sd:
            p[f"{name}_{extra}_kernel"] = _conv_w(sd[f"{prefix}.{extra}.weight"])
            p[f"{name}_{extra}_bias"] = _np(sd[f"{prefix}.{extra}.bias"])


def _import_phydnet(sd):
    p = {}
    for name in ["c1", "c2", "c3"]:
        _dcgan(p, f"encoder_E_{name}", f"encoder_E.{name}", sd, transposed=False)
    for pref in ["encoder_Ep", "encoder_Er"]:
        _dcgan(p, f"{pref}_c1", f"{pref}.c1", sd, transposed=False)
        _dcgan(p, f"{pref}_c2", f"{pref}.c2", sd, transposed=False)
    for pref in ["decoder_Dp", "decoder_Dr"]:
        _dcgan(p, f"{pref}_upc1", f"{pref}.upc1", sd, transposed=True)
        _dcgan(p, f"{pref}_upc2", f"{pref}.upc2", sd, transposed=True)
    _dcgan(p, "decoder_D_upc1", "decoder_D.upc1", sd, transposed=True)
    _dcgan(p, "decoder_D_upc2", "decoder_D.upc2", sd, transposed=True)
    p["decoder_D_upc3_kernel"] = _convT_w(sd["decoder_D.upc3.weight"])
    p["decoder_D_upc3_bias"] = _np(sd["decoder_D.upc3.bias"])
    for j in range(_count(sd, "phycell.cell_list.{}.F.conv1.weight")):
        _phycell(p, f"phycell{j}", f"phycell.cell_list.{j}", sd)
    for j in range(_count(sd, "convcell.cell_list.{}.conv.weight")):
        p[f"convcell{j}_conv_kernel"] = _conv_w(sd[f"convcell.cell_list.{j}.conv.weight"])
        p[f"convcell{j}_conv_bias"] = _np(sd[f"convcell.cell_list.{j}.conv.bias"])
    return {"params": p}


# ------------------------------------------------------------------- ST-Phy
def _import_st_phy(sd):
    p = {}
    for name, src in [("ae_enc_conv1", "autoencoder.encoder.conv1"),
                      ("ae_enc_conv2", "autoencoder.encoder.conv2"),
                      ("ae_enc_mean", "autoencoder.encoder.mean_layer"),
                      ("ae_dec_fc1", "autoencoder.decoder.fc1")]:
        p[f"{name}_kernel"] = _conv_w(sd[f"{src}.weight"])
        p[f"{name}_bias"] = _np(sd[f"{src}.bias"])
    for i in (1, 2, 3):
        p[f"ae_dec_conv{i}_kernel"] = _convT_w(sd[f"autoencoder.decoder.conv{i}.weight"])
        p[f"ae_dec_conv{i}_bias"] = _np(sd[f"autoencoder.decoder.conv{i}.bias"])
    ac = "st_cell_list.0.conv_a.0.weight" in sd
    conv_names = [("conv_x", "ln_x"), ("conv_h", "ln_h")] \
        + ([("conv_a", "ln_a")] if ac else []) \
        + [("conv_m", "ln_m"), ("conv_o", "ln_o")]
    for i in range(_count(sd, "st_cell_list.{}.conv_x.0.weight")):
        for cn, ln in conv_names:
            p[f"st_cell{i}_{cn}_kernel"] = _conv_w(sd[f"st_cell_list.{i}.{cn}.0.weight"])
            if f"st_cell_list.{i}.{cn}.0.bias" in sd:
                p[f"st_cell{i}_{cn}_bias"] = _np(sd[f"st_cell_list.{i}.{cn}.0.bias"])
            p[f"st_cell{i}_{ln}_scale"] = _ln_chw(sd[f"st_cell_list.{i}.{cn}.1.weight"])
            p[f"st_cell{i}_{ln}_bias"] = _ln_chw(sd[f"st_cell_list.{i}.{cn}.1.bias"])
        p[f"st_cell{i}_conv_last_kernel"] = _conv_w(sd[f"st_cell_list.{i}.conv_last.weight"])
        if f"st_cell_list.{i}.conv_last.bias" in sd:
            p[f"st_cell{i}_conv_last_bias"] = _np(sd[f"st_cell_list.{i}.conv_last.bias"])
    for i in range(_count(sd, "phycell_list.{}.F.conv1.weight")):
        _phycell(p, f"phycell{i}", f"phycell_list.{i}", sd)
    for i in range(_count(sd, "hidden_conv_list.{}.weight")):
        p[f"hidden_conv{i}_kernel"] = _conv_w(sd[f"hidden_conv_list.{i}.weight"])
        if f"hidden_conv_list.{i}.bias" in sd:
            p[f"hidden_conv{i}_bias"] = _np(sd[f"hidden_conv_list.{i}.bias"])
    p["adapter_kernel"] = _conv_w(sd["adapter.weight"])
    if ac:
        p["action_inflate_kernel"] = _linear_w(sd["action_inflate.weight"])
        p["action_conv_h_kernel"] = _conv_w(sd["action_conv_h.weight"])
        p["action_conv_w_kernel"] = _conv_w(sd["action_conv_w.weight"])
    return {"params": p}


# --------------------------------------------------------------------- LSTM
def _import_lstm(sd):
    r"""Maps the encoder/bottleneck/decoder weights. LSTM cell weights are
    mapped only when present (see module docstring: the reference never
    registers them, so plain reference state_dicts lack them — and the
    reference never trained them either, so nothing of value is lost; our
    freshly initialized cells are the sensible replacement)."""
    p = {}
    for name in ["enc1", "enc2", "enc3"]:
        p[f"{name}_kernel"] = _conv_w(sd[f"{name}.weight"])
        p[f"{name}_bias"] = _np(sd[f"{name}.bias"])
    for name in ["dec1", "dec2", "dec3"]:
        p[f"{name}_kernel"] = _convT_w(sd[f"{name}.weight"])
        p[f"{name}_bias"] = _np(sd[f"{name}.bias"])
    for name in ["to_linear", "from_linear", "action_inflate"]:
        if f"{name}.weight" in sd:
            p[f"{name}_kernel"] = _linear_w(sd[f"{name}.weight"])
            p[f"{name}_bias"] = _np(sd[f"{name}.bias"])
    for i in range(_count(sd, "rnn_layers.{}.weight_ih")):
        p[f"lstm{i}_w_ih"] = _linear_w(sd[f"rnn_layers.{i}.weight_ih"])
        p[f"lstm{i}_b_ih"] = _np(sd[f"rnn_layers.{i}.bias_ih"])
        p[f"lstm{i}_w_hh"] = _linear_w(sd[f"rnn_layers.{i}.weight_hh"])
        p[f"lstm{i}_b_hh"] = _np(sd[f"rnn_layers.{i}.bias_hh"])
    return {"params": p}


_IMPORTERS = {
    "copy": lambda sd: {"params": {}},
    "convlstm-shi": lambda sd: _import_ef(sd, _ef_convlstm_rnn),
    "trajgru": lambda sd: _import_ef(sd, _ef_trajgru_rnn),
    "predrnn-pp": _import_predrnn,
    "unet-3d": _import_unet3d,
    "phy": _import_phydnet,
    "st-phy": _import_st_phy,
    "lstm": _import_lstm,
}


def import_state_dict(model_id, state_dict, dtype=None):
    r"""Maps a reference torch ``state_dict`` into our ``variables`` dict
    (``{"params": ..., ["batch_stats": ...]}``), as jnp arrays.

    Args:
        model_id: registry id of the TARGET model (``copy``, ``lstm``,
            ``unet-3d``, ``phy``, ``st-phy``, ``predrnn-pp``,
            ``convlstm-shi``, ``trajgru``).
        state_dict: flat mapping of reference parameter names to torch
            tensors or numpy arrays.
        dtype: optional jnp dtype to cast all leaves to (default: keep f32).
    """
    import jax.numpy as jnp
    if model_id not in _IMPORTERS:
        raise ValueError(
            f"no torch importer for model id '{model_id}' "
            f"(available: {sorted(_IMPORTERS)}); TPU-native extras have no "
            f"torch analog to import from")
    sd = {k: _np(v) for k, v in state_dict.items()}
    variables = _IMPORTERS[model_id](sd)
    import jax
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype) if dtype else jnp.asarray(a), variables)


def _infer_model_kwargs(model_id, ref_model):
    r"""Constructor kwargs for our model, read off the reference module's
    attributes: every field our flax dataclass declares whose name matches a
    simple-typed reference attribute (the hyperparameter names are shared by
    design), plus the VPModel basics."""
    import dataclasses
    from vp_suite_tpu.models import MODEL_CLASSES
    cls = MODEL_CLASSES[model_id]
    skip = {"parent", "name", "img_shape", "action_size", "action_conditional",
            "tensor_value_range"}
    kwargs = {
        "img_shape": tuple(ref_model.img_shape),
        "action_size": int(getattr(ref_model, "action_size", 0) or 0),
        "action_conditional": bool(getattr(ref_model, "action_conditional", False)),
        "tensor_value_range": tuple(getattr(ref_model, "tensor_value_range",
                                            (0.0, 1.0))),
    }
    for f in dataclasses.fields(cls):
        if f.name in skip or f.name.isupper():
            continue
        val = getattr(ref_model, f.name, None)
        if isinstance(val, (bool, int, float, str)):
            kwargs[f.name] = val
        elif isinstance(val, (tuple, list)) and all(
                isinstance(v, (bool, int, float, str)) for v in val):
            kwargs[f.name] = tuple(val)
    return kwargs


def import_torch_model(ref_model):
    r"""Converts an unpickled reference model object (as produced by
    ``torch.load`` on a reference checkpoint) into ``(model_id, model_kwargs,
    variables)``. Ready for ``MODEL_CLASSES[model_id](**model_kwargs)`` +
    ``model.apply(variables, ...)``."""
    cls_name = type(ref_model).__name__
    if cls_name not in TORCH_CLASS_TO_MODEL_ID:
        raise ValueError(f"unrecognized reference model class '{cls_name}' "
                         f"(known: {sorted(TORCH_CLASS_TO_MODEL_ID)})")
    model_id = TORCH_CLASS_TO_MODEL_ID[cls_name]
    sd = {k: _np(v) for k, v in ref_model.state_dict().items()}
    if model_id == "lstm":
        # recover the unregistered cells from the pickled plain list
        for i, cell in enumerate(getattr(ref_model, "rnn_layers", [])):
            for attr in ["weight_ih", "bias_ih", "weight_hh", "bias_hh"]:
                sd[f"rnn_layers.{i}.{attr}"] = _np(getattr(cell, attr))
    return model_id, _infer_model_kwargs(model_id, ref_model), \
        import_state_dict(model_id, sd)


def load_torch_checkpoint(ckpt_path, map_location="cpu"):
    r"""Loads a reference ``*.pth`` checkpoint (a pickled torch module —
    ``vp_suite/vpsuite.py:394``; the reference vp_suite package must be
    importable for unpickling) and converts it. Returns ``(model_id,
    model_kwargs, variables)``."""
    import torch
    ref_model = torch.load(ckpt_path, map_location=map_location,
                           weights_only=False)
    return import_torch_model(ref_model)
