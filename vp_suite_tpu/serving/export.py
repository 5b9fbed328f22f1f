r"""AOT model export for serving (``jax.export`` / StableHLO).

The reference deploys by pickling the whole torch module
(``vp_suite/vpsuite.py:392-394``) — loading it requires the full vp-suite
source tree and a torch runtime. The TPU-native serving story is ahead-of-
time export instead: the jitted predictor (params baked in as constants) is
lowered once to **StableHLO** and serialized to a single portable artifact
that any JAX runtime — CPU, TPU, same or different host — can deserialize
and `call` WITHOUT this package, the model class, or the checkpoint on the
serving side. Versioned StableHLO gives forward-compatibility guarantees
that a Python pickle never can.

Usage::

    from vp_suite_tpu.serving import export_predictor, save_predictor, \
        load_predictor
    exported = export_predictor(model, state, context_frames=5,
                                pred_frames=10, batch_size=8)
    save_predictor(exported, "predictor.stablehlo")
    # ... on the serving host (only jax needed):
    predict = load_predictor("predictor.stablehlo")
    preds = predict(frames)   # [b, ctx, h, w, c] -> [b, pred, h, w, c]
"""
from pathlib import Path

import jax
import jax.numpy as jnp


def export_predictor(model, state, context_frames: int, pred_frames: int,
                     batch_size: int = 1, compute_dtype=None):
    r"""Lowers the model's inference path to a ``jax.export.Exported``.

    The input signature is ``[batch_size, T, h, w, c]`` float32 frames with
    ``T = context_frames`` (+ ``pred_frames`` zero-padded frames for
    ``NEEDS_COMPLETE_INPUT`` models, which consume the full window shape);
    output is the ``[batch_size, pred_frames, h, w, c]`` float32 prediction.
    Params and extra collections ride along as baked-in constants, so the
    artifact is self-contained. ``compute_dtype=jnp.bfloat16`` bakes a
    mixed-precision serving graph (bf16 activations keep the TPU MXU at
    full rate; I/O stays float32) regardless of how the model was
    trained. ``batch_size=None`` exports a BATCH-POLYMORPHIC artifact
    (symbolic leading dim): one file serves any batch size — the runtime
    still compiles once per concrete batch it sees, so production TPU
    serving should prefer a few fixed sizes."""
    from vp_suite_tpu.training.loop import _apply_model

    if compute_dtype is not None and model.compute_dtype != compute_dtype:
        model = model.clone(compute_dtype=compute_dtype)
    c, h, w = model.img_shape
    t_in = context_frames + (pred_frames if model.NEEDS_COMPLETE_INPUT else 0)
    if batch_size is None:
        from jax import export as _jexport
        batch_size, = _jexport.symbolic_shape("b")
    x_spec = jax.ShapeDtypeStruct((batch_size, t_in, h, w, c), jnp.float32)
    params, extra_vars = state.params, state.extra_vars
    from jax import export as jexport

    if model.action_conditional:
        # action-conditional artifact signature: (frames, actions) with
        # actions covering context + horizon steps
        a_spec = jax.ShapeDtypeStruct(
            (batch_size, context_frames + pred_frames,
             max(model.action_size, 1)), jnp.float32)

        def predict_ac(x, actions):
            (preds, _), _ = _apply_model(model, params, extra_vars, x,
                                         pred_frames=pred_frames,
                                         train=False, actions=actions)
            return preds.astype(jnp.float32)

        return jexport.export(jax.jit(predict_ac))(x_spec, a_spec)

    def predict(x):
        (preds, _), _ = _apply_model(model, params, extra_vars, x,
                                     pred_frames=pred_frames, train=False)
        return preds.astype(jnp.float32)

    return jexport.export(jax.jit(predict))(x_spec)


def save_predictor(exported, path):
    r"""Serializes an ``Exported`` to one portable StableHLO artifact."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(bytes(exported.serialize()))
    return path


def load_predictor(path):
    r"""Deserializes a saved artifact into a callable ``frames -> preds``
    (``(frames, actions) -> preds`` for action-conditional artifacts).
    Needs only jax on the serving side — not this package or torch."""
    from jax import export as jexport
    exported = jexport.deserialize(bytearray(Path(path).read_bytes()))

    def predict(*args):
        return exported.call(*args)

    predict.exported = exported
    return predict
