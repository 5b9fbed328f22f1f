r"""Orbax checkpoint backend: sharded, multi-host-safe state persistence.

The msgpack backend (``checkpoint.py``) gathers the full TrainState to host
0 and writes one blob — fine single-host, but it serializes through one
process and materializes every FSDP/tp-sharded leaf unsharded. This backend
uses orbax (the standard JAX checkpointing library) instead:

- **sharded save**: each process writes only its addressable shards
  (OCDBT/tensorstore under the hood) — no gather, scales to multi-host;
- **sharded restore**: leaves are placed DIRECTLY onto the target mesh
  shardings (no replicated detour through host RAM), so resuming an
  ``fsdp=True`` run never materializes the full optimizer state per device.

Selected via ``VPSuite.train(ckpt_backend="orbax")``; the
``model_config.json`` sidecar (registry reconstruction, reference parity
``vp_suite/vpsuite.py:125-137``) is shared with the msgpack backend.
"""
import json
from pathlib import Path

import jax

from vp_suite_tpu.checkpoint.checkpoint import _jsonable, build_template_state

_STATE_DIR = "orbax_state"
_CKPTR = None


def _checkpointer():
    # one long-lived checkpointer: StandardCheckpointer owns async-write
    # resources (background thread); constructing one per save leaks them
    # over a long run and triggers orbax "was not closed" warnings
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint_orbax(ckpt_dir, state, model_id: str, model_config: dict,
                          run_config: dict = None):
    r"""Writes the TrainState sharded (every process writes its own shards)
    plus the same JSON sidecars as the msgpack backend."""
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    ckptr = _checkpointer()
    path = ckpt_dir / _STATE_DIR
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        cfg = {"model_id": model_id, "model_config": _jsonable(model_config),
               "backend": "orbax"}
        with open(ckpt_dir / "model_config.json", "w") as f:
            json.dump(cfg, f, indent=2, default=str)
        if run_config is not None:
            with open(ckpt_dir / "run_cfg.json", "w") as f:
                json.dump(_jsonable(run_config), f, indent=2, default=str)


def restore_checkpoint_orbax(ckpt_dir, template_state):
    r"""Restores a TrainState saved by :func:`save_checkpoint_orbax`.

    ``template_state`` supplies structure, dtypes AND target shardings: each
    leaf is restored directly onto the corresponding sharding of the
    template (committed leaves keep their mesh placement; uncommitted ones
    restore to host-local arrays)."""
    import orbax.checkpoint as ocp

    def _abstract(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            sharding = getattr(x, "sharding", None)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return x

    target = jax.tree_util.tree_map(_abstract, template_state)
    ckptr = _checkpointer()
    return ckptr.restore(Path(ckpt_dir).absolute() / _STATE_DIR, target)


def load_checkpoint_orbax(ckpt_dir, optimizer=None, run_config: dict = None):
    r"""Full load (model + state) mirroring ``checkpoint.load_checkpoint``:
    the shared template builder plus an orbax shard restore."""
    model, template, model_id = build_template_state(ckpt_dir, optimizer,
                                                     run_config)
    state = restore_checkpoint_orbax(ckpt_dir, template)
    return model, state, model_id
