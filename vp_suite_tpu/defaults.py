r"""Package settings and default run configuration.

TPU-native re-design of the reference's config layer
(``vp_suite/defaults.py:11-68``): same three-tier config system (package
settings / run config / per-component configs), but with JAX-specific knobs
(device platform, compute dtype, mesh axes) added to the run config.
"""
import dataclasses
import json
import os
from pathlib import Path


class _PackageSettings:
    r"""Package-level constants and persistent paths.

    Mirrors the reference's ``_PackageSettings`` (``defaults.py:11-34``): a
    ``local_config.json`` pins the run path on first use; all run artifacts
    (checkpoints, data, logs) live below ``RUN_PATH``.
    """

    PKG_ROOT_PATH = Path(__file__).parent.parent
    PKG_SRC_PATH = Path(__file__).parent
    PKG_RESOURCES = PKG_SRC_PATH / "resources"
    LOCAL_CONFIG_FP: str = str((PKG_RESOURCES / "local_config.json").resolve())
    DEFAULT_RUN_PATH = PKG_ROOT_PATH / "vp-suite-data"
    RUN_PATH = None

    def __init__(self):
        try:
            with open(self.LOCAL_CONFIG_FP, "r") as f:
                self.RUN_PATH = Path(json.load(f)["run_path"])
        except (FileNotFoundError, KeyError, json.JSONDecodeError):
            self.RUN_PATH = self.DEFAULT_RUN_PATH
            try:
                self.PKG_RESOURCES.mkdir(parents=True, exist_ok=True)
                with open(self.LOCAL_CONFIG_FP, "w") as f:
                    json.dump({"run_path": str(self.RUN_PATH.resolve())}, f)
            except OSError:
                pass
        self.OUT_PATH = self.RUN_PATH / "output"
        self.DATA_PATH = self.RUN_PATH / "data"
        self.LOG_PATH = self.RUN_PATH / "logs"

    def set_run_path(self, new_path):
        r"""Re-points RUN_PATH (and derived paths) and persists the choice."""
        self.RUN_PATH = Path(new_path)
        self.OUT_PATH = self.RUN_PATH / "output"
        self.DATA_PATH = self.RUN_PATH / "data"
        self.LOG_PATH = self.RUN_PATH / "logs"
        self.PKG_RESOURCES.mkdir(parents=True, exist_ok=True)
        with open(self.LOCAL_CONFIG_FP, "w") as f:
            json.dump({"run_path": str(self.RUN_PATH.resolve())}, f)


@dataclasses.dataclass
class DefaultRunConfig:
    r"""Default run configuration (training/testing behaviour).

    Field-for-field parity with the reference run config
    (``vp_suite/defaults.py:37-64``), plus TPU-native additions at the bottom.
    All fields can be overridden by kwargs in ``VPSuite.train()`` /
    ``VPSuite.test()``; unknown keys are rejected.
    """
    no_train: bool = False
    no_val: bool = False
    no_vis: bool = False
    no_wandb: bool = False  # kept for API parity; external logging is optional
    vis_every: int = 10
    n_vis: int = 5
    vis_mode: str = "gif"
    vis_compare: bool = False
    vis_context_frame_idx: int = None
    seed: int = 42
    lr: float = 0.0001
    epochs: int = 1000000
    max_training_hours: float = 48
    batch_size: int = 32
    losses_and_scales: dict = dataclasses.field(default_factory=lambda: {"mse": 1.0})
    val_rec_criterion: str = "mse"
    metrics: list = dataclasses.field(default_factory=lambda: ["mse", "lpips", "psnr", "ssim"])
    context_frames: int = 10
    pred_frames: int = 10
    seq_step: int = 1
    use_actions: bool = False
    out_dir: str = None

    # --- TPU-native additions (not present in the reference) ---
    device: str = "auto"            #: "auto" picks TPU if present, else CPU.
    compute_dtype: str = None  #: None inherits the model's dtype; "bfloat16"
    #: rebuilds the model with mixed-precision activations for this run.
    data_axis: str = "data"         #: Name of the data-parallel mesh axis.
    num_devices: int = 0            #: 0 = use all local devices for data parallelism.
    fsdp: bool = False              #: ZeRO-style: shard params + optimizer state over the data axis (XLA all-gathers for compute, grads land reduce-scattered). Cuts per-device state HBM ~n_devices x.
    ckpt_backend: str = "msgpack"   #: "msgpack" (single-blob, host-0) or "orbax" (sharded tensorstore write per process; multi-host + FSDP-friendly).
    accum_steps: int = 1            #: Gradient accumulation: split each batch into k microbatches, average grads, ONE optimizer update — full-batch gradient at 1/k activation memory.
    multihost: bool = False         #: Initialize jax.distributed and shard data per process (one process per host).
    prefetch_batches: int = 2       #: Host->device pipeline depth.
    hbm_cache: str = "auto"         #: "auto" stages the training set into device memory when it fits ``hbm_cache_mb`` (epochs then batch by device-side gather — the slow host leaves the hot path); "on" errors if it does not fit; "off" forces the host loader.
    hbm_cache_mb: int = 2048        #: Device-memory budget (MB) for the staged training set.
    steps_per_epoch: int = 0        #: 0 = full pass over the training set.
    val_batch_size: int = 0         #: 0 = use batch_size (reference used 1; set 1 to reproduce exactly).
    log_every: int = 50             #: Console/JSONL metric logging cadence (steps).
    profile_dir: str = None         #: If set, dump a jax.profiler trace here.


def _as_dict(cfg: DefaultRunConfig) -> dict:
    return dataclasses.asdict(cfg)


SETTINGS = _PackageSettings()
DEFAULT_RUN_CONFIG = _as_dict(DefaultRunConfig())
