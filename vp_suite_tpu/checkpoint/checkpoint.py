r"""Checkpointing: params + optimizer state + step + schedule state + config.

Replaces the reference's whole-module pickles (``torch.save(model)``,
``vp_suite/vpsuite.py:392-394``) with explicit, framework-agnostic artifacts:

- ``checkpoint.msgpack``: the full TrainState pytree (flax serialization),
- ``model_config.json``: (model_id, config) so the model is reconstructed
  through the registry (``load_model`` parity: ``vpsuite.py:125-137``).

Unlike the reference, optimizer state and the step counter ARE saved, so
mid-training resume works (reference gap noted in SURVEY.md §5.4).
"""
import json
from pathlib import Path

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np


def _jsonable(obj):
    if isinstance(obj, (list, tuple)):
        return [_jsonable(o) for o in obj]
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if hasattr(obj, "item") and getattr(obj, "ndim", None) == 0:
        return obj.item()
    return obj


def save_checkpoint(ckpt_dir, state, model_id: str, model_config: dict,
                    run_config: dict = None):
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    state_host = jax.device_get(state)
    with open(ckpt_dir / "checkpoint.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(state_host))
    cfg = {"model_id": model_id, "model_config": _jsonable(model_config)}
    with open(ckpt_dir / "model_config.json", "w") as f:
        json.dump(cfg, f, indent=2, default=str)
    if run_config is not None:
        with open(ckpt_dir / "run_cfg.json", "w") as f:
            json.dump(_jsonable(run_config), f, indent=2, default=str)


def model_from_config(model_id: str, model_config: dict):
    r"""Reconstructs a model instance from registry id + config dict."""
    from vp_suite_tpu.models import MODEL_CLASSES
    cls = MODEL_CLASSES[model_id]
    fields = set(cls.__dataclass_fields__)
    kwargs = {}
    for k, v in model_config.items():
        if k in ("parent", "name") or k.isupper() or k not in fields:
            continue
        if isinstance(v, list):
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        if k == "compute_dtype":
            v = jnp.dtype(v) if v is not None else None
        kwargs[k] = v
    return cls(**kwargs)


def build_template_state(ckpt_dir, optimizer=None, run_config: dict = None):
    r"""Shared by the msgpack and orbax backends: reconstructs the model via
    the registry and builds a template TrainState with the stored run
    config's shapes, so serialized bytes/shards restore with the correct
    structure. Returns ``(model, template_state, model_id)``."""
    from vp_suite_tpu.training.train_state import create_train_state
    ckpt_dir = Path(ckpt_dir)
    with open(ckpt_dir / "model_config.json", "r") as f:
        cfg = json.load(f)
    model = model_from_config(cfg["model_id"], cfg["model_config"])

    rc = run_config or {}
    if not rc and (ckpt_dir / "run_cfg.json").exists():
        with open(ckpt_dir / "run_cfg.json", "r") as f:
            rc = json.load(f)
    import optax
    opt = optimizer
    if opt is None:
        opt = optax.inject_hyperparams(optax.adam)(
            learning_rate=rc.get("lr", 1e-4) if rc else 1e-4)
    template = create_train_state(
        model, opt, jax.random.PRNGKey(0), batch_size=1,
        context_frames=rc.get("context_frames") if rc else None,
        pred_frames=rc.get("pred_frames", 1) if rc else 1)
    return model, template, cfg["model_id"]


def load_checkpoint(ckpt_dir, optimizer=None, run_config: dict = None):
    r"""Loads (model, state, model_id) from a msgpack checkpoint directory."""
    model, template, model_id = build_template_state(ckpt_dir, optimizer,
                                                     run_config)
    with open(Path(ckpt_dir) / "checkpoint.msgpack", "rb") as f:
        state = flax.serialization.from_bytes(template, f.read())
    return model, state, model_id
