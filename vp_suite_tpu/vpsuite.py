r"""The VPSuite facade: the main workbench of vp-suite-tpu.

API parity with the reference ``VPSuite``
(``vp_suite/vpsuite.py:28-626``): ``load_dataset / download_dataset /
create_model / load_model / train / hyperopt / test / reset_rng`` with the
same semantics (REQUIRED_ARGS auto-fill from the last loaded dataset,
registry-driven construction, compat checks and adapters, CopyLastFrame
baseline injected into every test run, best/final checkpointing,
per-prediction-horizon test metrics).

Execution is TPU-native: jitted train/eval steps (fwd→loss→bwd→update in one
XLA program), batch sharding over a ``jax.sharding`` data mesh, host-side
ReduceLROnPlateau writing into an ``optax.inject_hyperparams`` state, and
msgpack checkpoints of (params, opt state, step, schedule state).
"""
import json
import os
import random
import time
import warnings
from copy import deepcopy
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vp_suite_tpu.defaults import SETTINGS, DEFAULT_RUN_CONFIG
from vp_suite_tpu.utils.dataset_wrapper import VPDatasetWrapper
from vp_suite_tpu.datasets import DATASET_CLASSES
from vp_suite_tpu.models import MODEL_CLASSES, AVAILABLE_MODELS
from vp_suite_tpu.models.copy_last_frame import CopyLastFrame
from vp_suite_tpu.measure import LOSS_CLASSES
from vp_suite_tpu.measure.loss_provider import PredictionLossProvider
from vp_suite_tpu.measure.metric_provider import PredictionMetricProvider
from vp_suite_tpu.utils.utils import timestamp, check_optuna_config
from vp_suite_tpu.utils.compatibility import (
    check_model_and_data_compat, check_run_and_model_compat, AdapterChain)
from vp_suite_tpu.base.base_model import VPModel
from vp_suite_tpu.training.data import BatchLoader
from vp_suite_tpu.training.loop import make_train_step, make_eval_step, make_predict_fn
from vp_suite_tpu.training.train_state import create_train_state, TrainState
from vp_suite_tpu.training.schedule import ReduceLROnPlateau, set_learning_rate
from vp_suite_tpu.parallel.mesh import (make_mesh, shard_params, batch_sharding,
                                        replicated_sharding)
from vp_suite_tpu.checkpoint import save_checkpoint, load_checkpoint


class ModelEntry:
    r"""A loaded/created model plus its functional state (the analog of the
    reference's stateful nn.Module entries in ``VPSuite.models``)."""

    def __init__(self, model, state, model_id, model_dir=None):
        self.model = model
        self.state = state
        self.model_id = model_id
        self.model_dir = model_dir

    @property
    def NAME(self):
        return self.model.NAME

    @property
    def config(self):
        return self.model.config


class VPSuite:
    def __init__(self, device: str = "auto", compilation_cache: bool = True):
        r"""device: 'auto' (TPU if present, else CPU), 'tpu', or 'cpu'."""
        if compilation_cache:
            from vp_suite_tpu.utils.utils import enable_compilation_cache
            enable_compilation_cache()
        if device == "auto":
            platforms = {d.platform for d in jax.devices()}
            device = "tpu" if "tpu" in platforms else "cpu"
        self.device = device
        self.clear_models()
        self.clear_datasets()

    def _devices(self):
        try:
            return jax.devices(self.device)
        except RuntimeError:
            return jax.devices()

    # ------------------------------------------------------------------ #
    # dataset / model management (parity: vpsuite.py:51-187)
    @property
    def training_sets(self):
        return [d for d in self.datasets if d.is_training_set]

    @property
    def test_sets(self):
        return [d for d in self.datasets if d.is_test_set]

    def clear_datasets(self):
        self.datasets = []

    def clear_models(self):
        self.models = []

    def load_dataset(self, dataset_id: str, split: str = "train", **dataset_kwargs):
        dataset_class = DATASET_CLASSES[dataset_id]
        seq_kwargs = {k: dataset_kwargs.pop(k) for k in
                      ["context_frames", "pred_frames", "seq_step"] if k in dataset_kwargs}
        dataset = VPDatasetWrapper(dataset_class, split, **dataset_kwargs)
        print(f"loaded dataset '{dataset.NAME}' (action size: {dataset.action_size})")
        if seq_kwargs:
            dataset.set_seq_len(
                seq_kwargs.get("context_frames", DEFAULT_RUN_CONFIG["context_frames"]),
                seq_kwargs.get("pred_frames", DEFAULT_RUN_CONFIG["pred_frames"]),
                seq_kwargs.get("seq_step", DEFAULT_RUN_CONFIG["seq_step"]))
        self.datasets.append(dataset)
        return dataset

    def download_dataset(self, dataset_id: str):
        DATASET_CLASSES[dataset_id].download_and_prepare_dataset()

    def list_available_datasets(self):
        for dataset_id, dataset_class in DATASET_CLASSES.items():
            print(f"'{dataset_id}': {dataset_class.NAME}")

    def list_available_models(self):
        for model_id, model_class in MODEL_CLASSES.items():
            print(f"'{model_id}': {model_class.NAME}")

    def load_model(self, model_dir: str, ckpt_name: str = "best_model"):
        r"""Loads a checkpointed model (registry reconstruction; parity:
        ``vpsuite.py:125-137``)."""
        ckpt_dir = Path(model_dir) / ckpt_name if ckpt_name else Path(model_dir)
        backend = "msgpack"
        cfg_path = ckpt_dir / "model_config.json"
        if cfg_path.exists():
            with open(cfg_path, "r") as f:
                backend = json.load(f).get("backend", "msgpack")
        if backend == "orbax":
            from vp_suite_tpu.checkpoint.orbax_backend import load_checkpoint_orbax
            model, state, model_id = load_checkpoint_orbax(ckpt_dir)
        else:
            model, state, model_id = load_checkpoint(ckpt_dir)
        entry = ModelEntry(model, state, model_id, model_dir=str(model_dir))
        self._model_setup(entry, loaded=True)
        return entry

    def load_torch_model(self, model_dir: str, ckpt_name: str = "best_model.pth",
                         seed: int = None):
        r"""Migrates a checkpoint trained with the original torch vp-suite
        (a pickled module, reference ``vpsuite.py:125-137``) into this
        framework and appends it to the loaded models. Requires torch plus the
        reference ``vp_suite`` package importable (for unpickling); see
        ``utils/torch_import.py`` for the pure state-dict path that needs
        neither."""
        from vp_suite_tpu.utils.torch_import import load_torch_checkpoint
        ckpt = os.path.join(model_dir, ckpt_name) if ckpt_name else model_dir
        model_id, model_kwargs, variables = load_torch_checkpoint(ckpt)
        model = MODEL_CLASSES[model_id](**model_kwargs)
        seed = DEFAULT_RUN_CONFIG["seed"] if seed is None else seed
        optimizer = optax.inject_hyperparams(optax.adam)(
            learning_rate=DEFAULT_RUN_CONFIG["lr"])
        state = create_train_state(model, optimizer, jax.random.PRNGKey(seed))
        imported = dict(variables)
        params = imported.pop("params", {})
        init_shapes = jax.tree_util.tree_map(jnp.shape, state.params)
        got_shapes = jax.tree_util.tree_map(jnp.shape, params)
        if model_id == "lstm" and init_shapes != got_shapes:
            # reference quirk: its LSTM cells are unregistered AND untrained
            # (models/lstm.py docstring) — keep our fresh cell init for any
            # missing leaves
            merged = dict(state.params)
            merged.update(params)
            params, got_shapes = merged, jax.tree_util.tree_map(jnp.shape, merged)
        if init_shapes != got_shapes:
            raise ValueError(
                f"imported torch checkpoint does not match model '{model_id}' "
                f"built with {model_kwargs}:\nexpected {init_shapes}\n"
                f"got {got_shapes}")
        state = state.replace(
            params=params,
            extra_vars={**state.extra_vars, **imported},
            opt_state=optimizer.init(params) if model.TRAINABLE else None)
        entry = ModelEntry(model, state, model_id, model_dir=str(model_dir))
        self._model_setup(entry, loaded=True)
        return entry

    def create_model(self, model_id: str, action_conditional: bool = False,
                     seed: int = None, **model_kwargs):
        r"""Creates a model, auto-filling REQUIRED_ARGS from the last loaded
        dataset (parity: ``vpsuite.py:139-171``)."""
        if model_id not in AVAILABLE_MODELS:
            raise ValueError(f"invalid model type specified! "
                             f"Available model types: {list(AVAILABLE_MODELS)}")
        model_class = MODEL_CLASSES[model_id]
        for param in model_class.REQUIRED_ARGS:
            if param not in model_kwargs:
                print(f"model parameter '{param}' not specified "
                      f"-> trying to take from last loaded dataset...")
                if len(self.datasets) < 1:
                    raise ValueError(f"no dataset loaded to take parameter '{param}' from")
                param_val = self.datasets[-1].config.get(param, None)
                if param_val is None:
                    raise ValueError(f"dataset '{self.datasets[-1].NAME}' doesn't provide "
                                     f"parameter '{param}', so it has to be specified "
                                     f"on model creation")
                model_kwargs[param] = param_val
        if action_conditional and not model_class.CAN_HANDLE_ACTIONS:
            warnings.warn("specified model can't handle actions "
                          "-> argument 'action_conditional' set to False")
            action_conditional = False
        model_kwargs["action_conditional"] = action_conditional
        for k, v in list(model_kwargs.items()):
            if isinstance(v, list):
                model_kwargs[k] = tuple(v)

        model = model_class(**model_kwargs)
        seed = DEFAULT_RUN_CONFIG["seed"] if seed is None else seed
        optimizer = optax.inject_hyperparams(optax.adam)(
            learning_rate=DEFAULT_RUN_CONFIG["lr"])
        state = create_train_state(model, optimizer, jax.random.PRNGKey(seed))
        entry = ModelEntry(model, state, model_id)
        self._model_setup(entry)
        return entry

    def _model_setup(self, entry: ModelEntry, loaded: bool = False):
        ac_str = "(action-conditional)" if entry.config["action_conditional"] else ""
        loaded_str = "loaded" if loaded else "created new"
        print(f"{loaded_str} model '{entry.NAME}' {ac_str}")
        n_params = sum(int(np.prod(np.shape(p)))
                       for p in jax.tree_util.tree_leaves(entry.state.params))
        print(f" - Model parameters (total): {n_params}")
        self.models.append(entry)

    # ------------------------------------------------------------------ #
    # run preparation (parity: vpsuite.py:189-243)
    def _prepare_run(self, split: str = "train", **run_kwargs):
        if len(self.models) == 0:
            raise RuntimeError("No model available. Load a pretrained model or create a "
                               "new instance before starting training or test runs")
        if split == "train" and len(self.training_sets) == 0:
            raise ValueError("No training sets loaded. Load a dataset in training mode "
                             "before starting training or test runs")
        elif split == "test" and len(self.test_sets) == 0:
            raise ValueError("No test sets loaded. Load a dataset in test mode "
                             "before starting training or test runs")
        run_config = deepcopy(DEFAULT_RUN_CONFIG)
        optuna_cfg = run_kwargs.pop("optuna", None)  # hyperopt search space rides along
        unknown = [k for k in run_kwargs if k not in run_config]
        if unknown:
            raise ValueError(f"Only the following run arguments are supported: "
                             f"{list(run_config.keys())} (got unknown: {unknown})")
        run_config.update(run_kwargs)
        if optuna_cfg is not None:
            run_config["optuna"] = optuna_cfg
        self._set_seeds(run_config["seed"])
        run_config["opt_direction"] = "maximize" \
            if LOSS_CLASSES[run_config["val_rec_criterion"]].BIGGER_IS_BETTER else "minimize"
        run_config["device"] = self.device
        return run_config

    def _set_seeds(self, seed: int):
        r"""The single seeding site (parity + warning: ``vpsuite.py:221-232``).
        JAX randomness is threaded explicitly via PRNG keys derived from this
        seed inside the train states."""
        random.seed(seed)
        np.random.seed(seed)
        self._root_rng = jax.random.PRNGKey(seed)

    def reset_rng(self, seed: int):
        self._set_seeds(seed)
        for dataset in self.datasets:
            dataset.reset_rng()

    # ------------------------------------------------------------------ #
    # TRAINING (parity: vpsuite.py:245-426)
    def _prepare_training(self, dataset_idx: int, model_idx: int, **run_kwargs):
        run_config = self._prepare_run("train", **run_kwargs)
        try:
            dataset = self.training_sets[dataset_idx]
            entry = self.models[model_idx]
        except IndexError:
            raise ValueError("given indices for model and/or dataset are invalid")
        dataset.set_seq_len(run_config["context_frames"], run_config["pred_frames"],
                            run_config["seq_step"])
        assert dataset.is_ready(), "dataset is not ready even though set_seq_len was called"
        check_run_and_model_compat(entry.model, run_config)
        check_model_and_data_compat(entry.model, dataset, strict_mode=True)
        return entry, dataset, run_config

    def train(self, trial=None, dataset_idx: int = -1, model_idx: int = -1, **run_kwargs):
        entry, dataset, run_config = self._prepare_training(dataset_idx, model_idx,
                                                            **run_kwargs)
        model = entry.model

        # run-level mixed-precision: compute_dtype in the run config rebuilds
        # the model with the requested ACTIVATION dtype (params stay f32, so
        # the existing state remains valid). Without this, a user passing
        # compute_dtype="bfloat16" to train() silently trained in f32.
        run_dtype = run_config.get("compute_dtype")
        if run_dtype and model.TRAINABLE:
            cur = jnp.dtype(model.compute_dtype).name \
                if getattr(model, "compute_dtype", None) is not None else None
            if jnp.dtype(run_dtype).name != cur:
                from vp_suite_tpu.checkpoint.checkpoint import model_from_config
                model = model_from_config(
                    entry.model_id,
                    {**model.config, "compute_dtype": jnp.dtype(run_dtype).name})
                entry.model = model
                print(f"run compute_dtype={jnp.dtype(run_dtype).name}: "
                      f"rebuilt model with mixed-precision activations")
        train_data, val_data = dataset.train_data, dataset.val_data

        # multi-host: init the distributed runtime and give this process its
        # shard of the data (SURVEY.md §5.8; the reference is single-device)
        if run_config["multihost"]:
            from vp_suite_tpu.parallel.distributed import initialize_multihost
            initialize_multihost()
        if jax.process_count() > 1:
            from vp_suite_tpu.parallel.distributed import (
                shard_dataset_for_process, local_batch_size)
            train_data = shard_dataset_for_process(train_data)
            val_data = shard_dataset_for_process(val_data)
            local_bs = local_batch_size(run_config["batch_size"])
            print(f"multi-host training: process {jax.process_index()} of "
                  f"{jax.process_count()}, local batch {local_bs}")
        else:
            local_bs = run_config["batch_size"]
        is_main = jax.process_index() == 0

        # hyperopt parameter suggestions
        optuna_config = run_config.get("optuna", None)
        using_hyperopt = trial is not None and isinstance(optuna_config, dict)
        if using_hyperopt:
            for param, p_dict in optuna_config.items():
                if "choices" in p_dict:
                    if param == "model_type":
                        warnings.warn("hyperopt across model and dataset parameters is "
                                      f"not yet supported -> using {model.NAME}")
                        continue
                    run_config[param] = trial.suggest_categorical(param, p_dict["choices"])
                else:
                    if p_dict.get("type") == "int":
                        run_config[param] = trial.suggest_int(
                            param, p_dict["min"], p_dict["max"])
                    else:
                        run_config[param] = trial.suggest_float(
                            param, p_dict["min"], p_dict["max"],
                            log=p_dict.get("scale", "uniform") == "log")

        # out dir
        if run_config["out_dir"] is None and entry.model_dir is not None:
            print(f"Using existing model save location ({entry.model_dir})...")
            out_path = Path(entry.model_dir)
        else:
            out_dir = run_config["out_dir"] or SETTINGS.OUT_PATH / timestamp("train")
            out_path = Path(out_dir)
            out_path.mkdir(parents=True, exist_ok=True)
            entry.model_dir = str(out_path.resolve())

        with_training = model.TRAINABLE and not run_config["no_train"]
        with_validation = not run_config["no_val"]

        # combined config + sidecar
        config = {**run_config, **model.config, **dataset.config,
                  "model_name": model.NAME, "dataset_name": dataset.NAME}
        save_config = {"run": run_config, "model": model.config,
                       "dataset": dataset.config, "device": self.device}
        if is_main:
            with open(out_path / "run_cfg.json", "w") as cfg_file:
                json.dump(save_config, cfg_file, indent=4, default=str)

        # external logging (wandb optional; JSONL metrics always); non-main
        # processes stay silent
        logger = _RunLogger(out_path, config, run_config["no_wandb"],
                            project="vp-suite-training") if is_main \
            else _NullLogger()

        # mesh / sharding
        batch_size = run_config["batch_size"]
        n_requested = run_config["num_devices"]
        if jax.process_count() > 1:
            # multi-host: the mesh must span every process's devices
            if n_requested:
                raise ValueError("num_devices cannot be set in multi-host mode "
                                 "(the mesh spans all hosts' devices)")
            n_requested = len(self._devices())
            if batch_size % n_requested != 0:
                raise ValueError(f"global batch_size {batch_size} not divisible "
                                 f"by {n_requested} global devices")
        if n_requested and batch_size % n_requested != 0:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"{n_requested} devices")
        if not n_requested:
            # auto: largest available device count that divides the batch
            n_avail = len(self._devices())
            n_requested = max(d for d in range(1, n_avail + 1) if batch_size % d == 0)
        mesh = make_mesh(n_requested, run_config["data_axis"], devices=self._devices())
        n_dev = mesh.devices.size
        if run_config["accum_steps"] > 1 \
                and (batch_size // n_dev) % run_config["accum_steps"] != 0:
            raise ValueError(
                f"per-device batch {batch_size // n_dev} not divisible by "
                f"accum_steps {run_config['accum_steps']}: the interleaved "
                "microbatch split would reshard the batch every step")
        if n_dev > 1:
            print(f"data-parallel training over {n_dev} devices")
        data_sharding = batch_sharding(mesh, run_config["data_axis"])

        # optimizer + state
        optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=run_config["lr"])
        if entry.state is None or entry.state.opt_state is None:
            entry.state = create_train_state(
                model, optimizer, jax.random.PRNGKey(run_config["seed"]),
                context_frames=run_config["context_frames"],
                pred_frames=run_config["pred_frames"])
        state = entry.state
        # commit the ENTIRE state (incl. step/rng/model_state scalars) to the
        # mesh: leaving any leaf uncommitted makes the first train_step call
        # compile a second program once its outputs come back committed
        state = jax.device_put(state, replicated_sharding(mesh))
        if run_config["fsdp"] and n_dev > 1:
            # ZeRO-style: params + optimizer state sharded over the data
            # axis (~n_dev x less state HBM per device); XLA all-gathers
            # weights at use sites and reduce-scatters their grads
            from vp_suite_tpu.parallel.mesh import shard_params_fsdp
            state = state.replace(
                params=shard_params_fsdp(state.params, mesh,
                                         axis=run_config["data_axis"]),
                opt_state=shard_params_fsdp(state.opt_state, mesh,
                                            axis=run_config["data_axis"]))
        state = set_learning_rate(state, run_config["lr"])

        # checkpoint backend: msgpack gathers to host 0; orbax writes each
        # process's shards in place (multi-host + FSDP-friendly) and must be
        # called from EVERY process
        def _save_ckpt(path, st):
            if run_config["ckpt_backend"] == "orbax":
                from vp_suite_tpu.checkpoint.orbax_backend import \
                    save_checkpoint_orbax
                save_checkpoint_orbax(path, st, entry.model_id, model.config,
                                      run_config)
            elif is_main:
                save_checkpoint(path, st, entry.model_id, model.config,
                                run_config)

        # losses + steps
        loss_provider = PredictionLossProvider(config)
        if config["val_rec_criterion"] not in config["losses_and_scales"]:
            raise ValueError(f"Validation criterion '{config['val_rec_criterion']}' has "
                             f"to be one of the chosen losses: "
                             f"{list(config['losses_and_scales'].keys())}")
        # fvd-as-loss is jittable too: FrechetVideoDistance routes traced
        # inputs through the differentiable eigh-based wasserstein2_jax
        # (parity: the reference FVD is loss-capable, fvd.py:22-24)
        use_jit = True
        train_step = make_train_step(model, run_config, optimizer, loss_provider,
                                     use_jit=use_jit,
                                     accum_steps=run_config["accum_steps"])
        eval_step = make_eval_step(model, run_config, loss_provider, use_jit=use_jit)
        predict_fn = make_predict_fn(model, run_config)

        # uint8 host->device transfer (4x less tunnel/PCIe traffic) is exact
        # up to 1/510 for [0,1]-range data; dequantized on device
        uint8_ok = [float(v) for v in dataset.config["tensor_value_range"]] == [0.0, 1.0]
        # drop_last=True keeps ONE compiled step shape (a ragged final batch
        # would recompile the jitted step — minutes on the remote-compile
        # TPU path; the torch reference trains the ragged batch instead)
        if len(train_data) < local_bs:
            raise ValueError(
                f"training set has {len(train_data)} sequences but "
                f"batch_size is {local_bs}: with the single-compiled-shape "
                "loader (drop_last) no batch would ever be formed — lower "
                "batch_size or provide more data")
        train_loader = BatchLoader(train_data, local_bs, shuffle=True,
                                   seed=run_config["seed"], drop_last=True,
                                   uint8_frames=uint8_ok)
        # device-memory cache for small file-backed datasets: stage every
        # sequence into HBM once, then every epoch batches by device-side row
        # gather (host per-step work = one [b]-int32 transfer) — the 1-core
        # host can't feed the chip through the item-decode path (the torch
        # reference leans on a 4-worker DataLoader, vpsuite.py:296-298).
        # device-synthesised datasets (MMF backend="device") have their own
        # generator; multi-host keeps per-process host shards.
        hbm_cache = val_hbm_cache = None
        if (run_config["hbm_cache"] != "off" and with_training
                and jax.process_count() == 1
                # on-the-fly datasets synthesize fresh sequences per access —
                # caching would silently freeze one epoch of data
                and not getattr(train_data, "ON_THE_FLY", False)):
            from vp_suite_tpu.training.data import (HBMCachedLoader,
                                                    estimate_cache_bytes)
            budget = run_config["hbm_cache_mb"] * 2 ** 20
            est = estimate_cache_bytes(train_data, uint8_ok)
            if est <= budget:
                hbm_cache = HBMCachedLoader(
                    train_data, local_bs, uint8_frames=uint8_ok,
                    sharding=data_sharding if n_dev > 1 else None)
                print(f"staged training set into device memory "
                      f"({hbm_cache.nbytes / 2**20:.1f} MB, "
                      f"{hbm_cache.n} sequences)")
                # the (small) validation set hits the same 1-core host
                # bottleneck every epoch — cache it within the same budget
                if (len(val_data)
                        and estimate_cache_bytes(val_data, uint8_ok)
                        <= budget - hbm_cache.nbytes):
                    val_bs0 = run_config.get("val_batch_size", 0) or local_bs
                    val_bs0 = max(1, min(val_bs0, len(val_data)))
                    val_hbm_cache = HBMCachedLoader(
                        val_data, val_bs0, uint8_frames=uint8_ok,
                        sharding=data_sharding
                        if (n_dev > 1 and val_bs0 % n_dev == 0) else None)
            elif run_config["hbm_cache"] == "on":
                raise ValueError(
                    f"hbm_cache='on' but the training set needs ~{est / 2**20:.0f} "
                    f"MB > hbm_cache_mb={run_config['hbm_cache_mb']} — raise the "
                    "budget or use hbm_cache='auto'/'off'")
        val_bs = run_config.get("val_batch_size", 0) or local_bs
        val_bs = max(1, min(val_bs, len(val_data)))
        val_loader = BatchLoader(val_data, batch_size=val_bs, shuffle=False,
                                 drop_last=True, uint8_frames=uint8_ok)

        scheduler = ReduceLROnPlateau(
            run_config["lr"],
            mode="max" if run_config["opt_direction"] == "maximize" else "min")
        best_val_loss = float("-inf") if run_config["opt_direction"] == "maximize" \
            else float("inf")

        def loss_improved(cur, best):
            return cur > best if run_config["opt_direction"] == "maximize" else cur < best

        steps_cap = run_config.get("steps_per_epoch", 0)
        profile_dir = run_config.get("profile_dir")

        training_timeout = time.time() + config["max_training_hours"] * 3600
        epochs_run = 0
        entry.train_epoch_fps = []  # per-epoch e2e frames/s (bench --e2e reads this)
        for epoch in range(run_config["epochs"]):
            print(f"\nEpoch: {epoch + 1} of {config['epochs']}")
            epochs_run += 1

            if with_training:
                t0 = time.time()
                n_steps, last_metrics = 0, {}
                if profile_dir and epoch == 1:
                    jax.profiler.start_trace(profile_dir)
                # device-resident synthesis backend: the dataset generates
                # every batch ON the accelerator from a PRNG key, so the
                # 1-core host never touches frame data (the torch reference
                # needs a 4-worker DataLoader here, vpsuite.py:296-298).
                # Multi-host runs keep the host path (per-process shards).
                use_device_gen = (
                    getattr(train_data, "backend", None) == "device"
                    and hasattr(train_data, "device_batch_iterator")
                    and jax.process_count() == 1)
                if use_device_gen:
                    epoch_steps = steps_cap or len(train_loader)
                    prefetched = train_data.device_batch_iterator(
                        local_bs, epoch_steps,
                        seed=run_config["seed"] * 9973 + epoch,
                        sharding=data_sharding if n_dev > 1 else None)
                elif hbm_cache is not None:
                    prefetched = hbm_cache.epoch_iterator(
                        seed=run_config["seed"] * 9973 + epoch)
                else:
                    from vp_suite_tpu.training.data import device_prefetch
                    prefetched = device_prefetch(
                        train_loader, sharding=data_sharding,
                        depth=run_config["prefetch_batches"])
                for device_batch in prefetched:
                    state, metrics = train_step(state, device_batch,
                                                jnp.asarray(epoch, jnp.float32))
                    n_steps += 1
                    if n_steps % run_config["log_every"] == 0:
                        last_metrics = {k: float(v) for k, v in metrics.items()}
                        print(f"  step {n_steps}: {last_metrics}")
                    if steps_cap and n_steps >= steps_cap:
                        break
                if n_steps:
                    # host fetch = real synchronization (block_until_ready is
                    # unreliable on remote-TPU backends)
                    float(np.asarray(metrics["total"]))
                if profile_dir and epoch == 1:
                    jax.profiler.stop_trace()
                dt = time.time() - t0
                frames_seen = n_steps * batch_size * (run_config["context_frames"]
                                                      + run_config["pred_frames"])
                entry.train_epoch_fps.append(frames_seen / max(dt, 1e-9))
                print(f"  trained {n_steps} steps in {dt:.1f}s "
                      f"({entry.train_epoch_fps[-1]:.1f} frames/s)")
            else:
                print("Skipping training loop.")

            val_losses = {}
            if with_validation:
                agg = []
                # route val batches through the same sharding as training: in
                # multi-host runs every jit input must be a global array. A
                # val batch that doesn't divide the mesh falls back to
                # single-device placement (single-host only).
                # in multi-host mode the global val batch is the per-process
                # val_bs times process_count, so the divisibility check is
                # against the LOCAL device count (global_bs % n_dev == 0 iff
                # val_bs % local_device_count == 0 for equal-sized hosts).
                global_val_bs = val_bs * jax.process_count()
                val_sharding = data_sharding if global_val_bs % n_dev == 0 else None
                if val_sharding is None and jax.process_count() > 1:
                    raise ValueError(
                        f"per-process val batch {val_bs} must divide the "
                        f"{jax.local_device_count()} local devices in "
                        f"multi-host mode")
                from vp_suite_tpu.training.data import device_prefetch as _prefetch
                if val_hbm_cache is not None:
                    val_iter = val_hbm_cache.epoch_iterator(seed=0,
                                                            shuffle=False)
                else:
                    val_iter = _prefetch(val_loader, sharding=val_sharding,
                                         depth=1)
                for device_batch in val_iter:
                    agg.append(eval_step(state, device_batch))
                if not agg:
                    raise RuntimeError("validation set is empty")
                val_losses = {k: float(np.mean([float(a[k]) for a in agg]))
                              for k in agg[0].keys()}
                indicator_loss = val_losses[run_config["val_rec_criterion"]]
                if with_training:
                    new_lr = scheduler.step(indicator_loss)
                    state = set_learning_rate(state, new_lr)
                print("Validation losses (mean over entire validation set):")
                for k, v in val_losses.items():
                    print(f" - {k}: {v}")
                if loss_improved(indicator_loss, best_val_loss):
                    best_val_loss = indicator_loss
                    entry.state = state
                    _save_ckpt(out_path / "best_model", state)
                    print(f"Minimum indicator loss ({config['val_rec_criterion']}) "
                          f"reduced -> model saved!")
            else:
                print("Skipping validation loop and simply saving current model "
                      "as the 'best' model.")
                entry.state = state
                _save_ckpt(out_path / "best_model", state)

            if (epoch + 1) % config["vis_every"] == 0 and not config["no_vis"] \
                    and is_main:
                print("Saving visualizations...")
                from vp_suite_tpu.utils.visualization import visualize_vid
                vis_out_dir = out_path / f"vis_ep_{epoch + 1:03d}"
                visualize_vid(val_data, config["context_frames"], config["pred_frames"],
                              lambda b: predict_fn(state, b), vis_out_dir,
                              n_vis=config["n_vis"], vis_mode=config["vis_mode"])

            logger.log_epoch(epoch, val_losses)
            if time.time() > training_timeout:
                print("Maximum training time exceeded, leaving training loop...")
                break

        print("\nTraining done, cleaning up...")
        entry.state = state
        _save_ckpt(out_path / "final_model", state)
        logger.finish()
        return best_val_loss

    # ------------------------------------------------------------------ #
    # HYPEROPT (parity: vpsuite.py:428-457; random-search fallback when
    # optuna isn't installed)
    def hyperopt(self, optuna_config: dict, n_trials: int = 30, dataset_idx: int = -1,
                 model_idx: int = -1, **run_kwargs):
        from functools import partial
        run_config = self._prepare_run(**run_kwargs)
        check_optuna_config(optuna_config)
        program = partial(self.train, dataset_idx=dataset_idx, model_idx=model_idx,
                          optuna=optuna_config, **run_kwargs)
        try:
            import optuna
            # AttributeError guard: the impl-match tier's ref_loader stubs an
            # empty `optuna` into sys.modules for the torch reference's sake
            study = optuna.create_study(direction=run_config["opt_direction"])
        except (ImportError, AttributeError):
            # TPE-lite sampler (same algorithm family as optuna's default;
            # see training/hyperopt.py) — beats the old random-search fallback
            from vp_suite_tpu.training.hyperopt import TPEStudy
            study = TPEStudy(direction=run_config["opt_direction"],
                             seed=run_config["seed"])
        study.optimize(program, n_trials=n_trials)
        best_params = study.best_params
        print("\nHyperparameter optimization complete. Best performing parameters:")
        for k, v in best_params.items():
            print(f" - {k}: {v}")
        return best_params

    # ------------------------------------------------------------------ #
    # TESTING (parity: vpsuite.py:459-626)
    def _prepare_testing(self, **run_kwargs):
        run_config = self._prepare_run("test", **run_kwargs)
        test_sets = self.test_sets
        for test_set in test_sets:
            test_set.set_seq_len(run_config["context_frames"], run_config["pred_frames"],
                                 run_config["seq_step"])
            assert test_set.is_ready()

        test_entries = []
        for entry in self.models:
            try:
                check_run_and_model_compat(entry.model, run_config)
                test_entries.append(entry)
            except ValueError as e:
                print(f"skipping test of model '{entry.NAME}' because of incompatibility "
                      f"with run config: {e}")

        model_lists_all_test_sets = []
        for test_set in test_sets:
            test_set_model_list = []
            for entry in test_entries:
                try:
                    pre, post = check_model_and_data_compat(entry.model, test_set)
                    test_set_model_list.append((entry, pre, post, []))
                except ValueError as e:
                    print(f"skipping test of model '{entry.NAME}' on dataset "
                          f"'{test_set.NAME}' because of incompatibility: {e}")
            # CopyLastFrame baseline, always added (parity: vpsuite.py:499-501)
            img_shape = test_set.config["img_shape"]
            clf = CopyLastFrame(img_shape=tuple(img_shape), action_size=0,
                                tensor_value_range=tuple(
                                    test_set.config["tensor_value_range"]))
            clf_entry = ModelEntry(clf, TrainState(params={}, extra_vars={},
                                                   opt_state=None,
                                                   step=jnp.asarray(0, jnp.int32),
                                                   model_state={},
                                                   rng=jax.random.PRNGKey(0)),
                                   "copy")
            test_set_model_list.append((clf_entry, AdapterChain(), AdapterChain(), []))
            model_lists_all_test_sets.append(test_set_model_list)

        return list(zip(test_sets, model_lists_all_test_sets)), run_config

    def _test_on_dataset(self, model_info_list, dataset, run_config, brief_test):
        test_data = dataset.test_data
        test_loader = BatchLoader(test_data, batch_size=1, shuffle=False)
        if len(test_loader) < 1:
            raise RuntimeError("loaded dataset does not contain any data (len < 1)")
        test_mode = "brief" if brief_test else "full"
        eval_length = min(len(test_loader), 10) if brief_test else len(test_loader)

        config = {**run_config, **dataset.config, "dataset_name": dataset.NAME}
        context_frames = config["context_frames"]
        pred_frames = config["pred_frames"]
        cfg = {"context_frames": context_frames, "pred_frames": pred_frames}
        metric_provider = PredictionMetricProvider(config)

        # build jitted adapted predictors per model
        predictors = []
        for (entry, pre, post, metrics_list) in model_info_list:
            model = entry.model
            state = entry.state

            def make_pred(model=model, state=state, pre=pre, post=post):
                from vp_suite_tpu.training.loop import _apply_model

                def predict(batch):
                    inputs, targets, actions = VPModel.unpack_data(
                        batch, cfg, needs_complete_input=model.NEEDS_COMPLETE_INPUT)
                    inputs = pre(inputs)
                    kw = {"actions": actions} if model.CAN_HANDLE_ACTIONS else {}
                    (preds, _), _ = _apply_model(model, state.params, state.extra_vars,
                                                 inputs, pred_frames=pred_frames,
                                                 train=False, **kw)
                    return post(preds), targets
                return jax.jit(predict)
            predictors.append(make_pred())

        loader_iter = iter(test_loader)
        for n in range(eval_length):
            batch = next(loader_iter)
            device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                            if isinstance(v, np.ndarray)}
            for (entry, pre, post, metrics_list), predict in zip(model_info_list,
                                                                 predictors):
                preds, targets = predict(device_batch)
                cur_metrics = metric_provider.get_metrics(preds, targets,
                                                          all_frame_cnts=True)
                metrics_list.append(cur_metrics)

        # visualizations
        timestamp_test = timestamp("test")
        vis_out_dir = SETTINGS.OUT_PATH / timestamp_test
        vis_out_dir.mkdir(parents=True, exist_ok=True)
        if not config["no_vis"]:
            print("Saving visualizations for tested models...")
            if getattr(test_data, "ON_THE_FLY", False):
                self.reset_rng(config["seed"])
            from vp_suite_tpu.utils.visualization import visualize_sequences
            model_predict_fns = {}
            for (entry, pre, post, _), predict in zip(model_info_list, predictors):
                name = entry.NAME.replace(" ", "_").replace("/", "-")
                model_predict_fns[name] = (lambda b, p=predict: (p(b)[0], None))
            visualize_sequences(test_data, context_frames, pred_frames,
                                model_predict_fns, vis_out_dir, n_vis=config["n_vis"],
                                vis_mode=config["vis_mode"],
                                vis_compare=config["vis_compare"],
                                vis_context_frame_idx=config["vis_context_frame_idx"])

        # aggregate + log metrics per model / per prediction horizon
        results = {}
        if eval_length > 0:
            logger = _TestLogger(vis_out_dir, test_mode, no_wandb=config["no_wandb"],
                                 no_vis=config["no_vis"])
            for (entry, _, _, metrics_list) in model_info_list:
                dp_range = range(len(metrics_list))
                frame_range = range(len(metrics_list[0]))
                metric_keys = metrics_list[0][0].keys()
                mean_metric_dicts = [
                    {mk: float(np.mean([metrics_list[dp][f][mk] for dp in dp_range]))
                     for mk in metric_keys}
                    for f in frame_range
                ]
                results[entry.NAME] = mean_metric_dicts
                logger.log_model(entry.NAME, entry.model_dir, mean_metric_dicts)
            logger.finish()
            with open(vis_out_dir / "test_metrics.json", "w") as f:
                json.dump(results, f, indent=2)
        return results

    def test(self, brief_test=False, **run_kwargs):
        test_sets_and_model_lists, run_config = self._prepare_testing(**run_kwargs)
        all_results = []
        for test_set, model_info_list in test_sets_and_model_lists:
            all_results.append(self._test_on_dataset(model_info_list, test_set,
                                                     run_config, brief_test))
        return all_results

    def predict(self, frames, actions=None, pred_frames: int = None,
                model_idx: int = -1):
        r"""Direct inference convenience: CONTEXT ``frames`` ``[b, t, h, w,
        c]`` (or a single ``[t, h, w, c]`` sequence) in the model's value
        range -> ``[b, pred_frames, h, w, c]`` predictions of the FUTURE
        frames ``t..t+pred_frames`` — uniformly for every model
        (``NEEDS_COMPLETE_INPUT`` models get the window zero-padded, like
        ``serving.export_predictor``). ``actions``, when given, must cover
        ``t + pred_frames`` steps. The reference only exposes prediction
        through the test loop (``vp_suite/vpsuite.py:461-626``); direct
        calls are a TPU-build addition. The jitted predictor is cached on
        the model entry per (context, horizon, actions) signature."""
        import jax.numpy as jnp
        if not self.models:
            raise ValueError("No model available for prediction")
        entry = self.models[model_idx]
        model = entry.model
        pred_frames = pred_frames or 1
        frames = jnp.asarray(frames, jnp.float32)
        squeeze = frames.ndim == 4
        if squeeze:
            frames = frames[None]
        b, ctx = frames.shape[:2]
        if ctx < (model.MIN_CONTEXT_FRAMES or 1):
            raise ValueError(f"need at least {model.MIN_CONTEXT_FRAMES} "
                             f"context frames, got {ctx}")
        total = ctx + pred_frames
        if model.NEEDS_COMPLETE_INPUT:
            frames = jnp.concatenate(
                [frames, jnp.zeros((b, pred_frames) + frames.shape[2:],
                                   frames.dtype)], axis=1)
        if actions is not None:
            actions = jnp.asarray(actions, jnp.float32)
            if squeeze and actions.ndim == 2:
                actions = actions[None]
            if actions.shape[1] < total:
                raise ValueError(f"actions must cover context + horizon "
                                 f"({total} steps), got {actions.shape[1]}")
            actions = actions[:, :total]
        else:
            actions = jnp.zeros((b, total, max(model.action_size, 1)),
                                jnp.float32)

        key = (ctx, pred_frames, bool(model.action_conditional))
        cache = getattr(entry, "_predict_fns", None)
        if cache is None:
            cache = entry._predict_fns = {}
        if key not in cache:
            run_config = {"context_frames": ctx, "pred_frames": pred_frames,
                          "use_actions": model.action_conditional}
            cache[key] = make_predict_fn(model, run_config)
        preds, _ = cache[key](entry.state, {"frames": frames,
                                            "actions": actions})
        return preds[0] if squeeze else preds

    def export_model(self, out_path, context_frames: int, pred_frames: int,
                     batch_size: int = 1, model_idx: int = -1,
                     compute_dtype=None):
        r"""AOT-exports a model's inference path to one portable StableHLO
        artifact (see ``vp_suite_tpu/serving/export.py``) — the TPU-native
        replacement for the reference's whole-module pickle deployment
        (``vp_suite/vpsuite.py:392-394``). The artifact is loadable with
        ``serving.load_predictor`` on any host with jax alone.
        ``compute_dtype=jnp.bfloat16`` bakes a mixed-precision serving
        graph (I/O stays float32)."""
        from vp_suite_tpu.serving import export_predictor, save_predictor
        if not self.models:
            raise ValueError("No model available to export")
        entry = self.models[model_idx]
        exported = export_predictor(entry.model, entry.state, context_frames,
                                    pred_frames, batch_size=batch_size,
                                    compute_dtype=compute_dtype)
        return save_predictor(exported, out_path)


# ---------------------------------------------------------------------- #
class _RunLogger:
    r"""Metric sink: wandb when available and enabled (parity:
    ``vpsuite.py:344-348,416-417``), JSONL + console always."""

    def __init__(self, out_path, config, no_wandb, project):
        self.out_path = Path(out_path)
        self.jsonl_fp = self.out_path / "metrics.jsonl"
        self.wandb = None
        if not no_wandb:
            try:
                import wandb
                wandb.init(config={k: str(v) for k, v in config.items()},
                           project=project, dir=str(SETTINGS.RUN_PATH))
                self.wandb = wandb
            except Exception:
                self.wandb = None

    def log_epoch(self, epoch, val_losses):
        rec = {"epoch": epoch, **{k: float(v) for k, v in val_losses.items()}}
        with open(self.jsonl_fp, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self.wandb is not None:
            self.wandb.log(val_losses)

    def finish(self):
        if self.wandb is not None:
            self.wandb.finish()


class _NullLogger:
    r"""Silent sink for non-main processes in multi-host runs."""

    def log_epoch(self, epoch, val_losses):
        pass

    def finish(self):
        pass


class _TestLogger:
    r"""Test-run metric sink (parity: ``vpsuite.py:588-611`` — per-tested-model
    wandb runs in project 'vp-suite-testing' incl. prediction videos, plus
    always-on JSONL + console)."""

    PROJECT = "vp-suite-testing"

    def __init__(self, vis_out_dir, test_mode, no_wandb=False, no_vis=False):
        self.vis_out_dir = Path(vis_out_dir)
        self.jsonl_fp = self.vis_out_dir / "test_metrics.jsonl"
        self.test_mode = test_mode
        self.no_vis = no_vis
        self.wandb = None
        self._n_logged = 0
        if not no_wandb:
            try:
                import wandb
                self.wandb = wandb
            except Exception:
                self.wandb = None

    def log_model(self, model_name, model_dir, mean_metric_dicts):
        with open(self.jsonl_fp, "a") as f:
            for fi, mmd in enumerate(mean_metric_dicts):
                f.write(json.dumps({"model": model_name, "model_dir": str(model_dir),
                                    "test_mode": self.test_mode,
                                    "pred_frames": fi + 1, **mmd}) + "\n")
        print(f"\n{model_name} (path: {model_dir}): ")
        for fi, mmd in enumerate(mean_metric_dicts):
            print(f"pred_frames: {fi + 1}")
            for k, v in mmd.items():
                print(f" -> {k}: {v}")
        if self.wandb is not None:
            try:
                self.wandb.init(
                    config={"test_mode": self.test_mode, "model_dir": str(model_dir)},
                    project=self.PROJECT,
                    name=f"{model_name} ({self.test_mode} test)",
                    dir=str(SETTINGS.RUN_PATH), reinit=(self._n_logged > 0))
                for fi, mmd in enumerate(mean_metric_dicts):
                    self.wandb.log({"pred_frames": fi + 1, **mmd})
                if not self.no_vis and model_dir is not None:
                    vid_fns = [fn for fn in sorted(os.listdir(str(self.vis_out_dir)))
                               if fn.split(".")[-1] in ("mp4", "gif")]
                    if vid_fns:
                        self.wandb.log({fn: self.wandb.Video(
                            str(self.vis_out_dir / fn), fps=4,
                            format=fn.split(".")[-1]) for fn in vid_fns})
            except Exception as e:
                print(f"wandb test logging failed ({e}); continuing with JSONL only")
                self.wandb = None
        self._n_logged += 1

    def finish(self):
        if self.wandb is not None:
            try:
                self.wandb.finish()
            except Exception:
                pass
