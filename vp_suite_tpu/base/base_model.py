r"""Base class for all video prediction models.

TPU-native re-design of the reference ``VPModel``
(``vp_suite/base/base_model.py:11-216``). Key differences, by design:

- Models are **pure flax modules**: parameters are explicit pytrees created by
  ``model.init_params(rng)``; the forward pass is a pure function
  ``model.apply(params, x, ...)`` that XLA traces once and compiles.
- The native tensor layout is **NTHWC** (``[b, t, h, w, c]``), so the channel
  dimension maps onto TPU vector lanes and convolutions lower naturally onto
  the MXU. (The reference uses NCHW, ``base_model.py:121``.)
- Autoregressive rollouts use ``jax.lax.scan`` over time instead of Python
  loops (reference hot loop: ``base_model.py:128-146``), keeping the carried
  hidden state chip-resident for the whole sequence.
- The reference's mutable training schedules (scheduled sampling etc.) become
  explicit functional state: see ``init_model_state`` and the training loop in
  ``vp_suite_tpu/training``.

Class constants keep the reference's exact names and semantics
(``base_model.py:21-29``) so the registry-driven test tiers carry over.
"""
import typing

import flax.linen as nn
import jax
import jax.numpy as jnp


class VPModel(nn.Module):
    r"""The base class for all video prediction models.

    Subclasses implement :meth:`__call__` (full rollout) and optionally
    :meth:`pred_1`. Hyperparameters are dataclass fields (flax module
    attributes) with defaults; required construction args mirror the
    reference's ``REQUIRED_ARGS`` (``base_model.py:25``).
    """

    # --- MODEL CONSTANTS (parity: reference base_model.py:21-29) ---
    NAME: typing.ClassVar[str] = None
    PAPER_REFERENCE: typing.ClassVar[str] = None
    CODE_REFERENCE: typing.ClassVar[str] = None
    MATCHES_REFERENCE: typing.ClassVar[str] = None
    REQUIRED_ARGS: typing.ClassVar[list] = ["img_shape", "action_size", "tensor_value_range"]
    CAN_HANDLE_ACTIONS: typing.ClassVar[bool] = False
    TRAINABLE: typing.ClassVar[bool] = True
    NEEDS_COMPLETE_INPUT: typing.ClassVar[bool] = False
    MIN_CONTEXT_FRAMES: typing.ClassVar[int] = 1
    #: Which train-step variant the training loop builds for this model
    #: ("default" | "teacher_forcing" | "scheduled_sampling") — the functional
    #: replacement for the reference's per-model train_iter overrides
    #: (phydnet.py:139-174, st_phy.py:183-216, predrnn_v2.py:319-365).
    TRAIN_REGIME: typing.ClassVar[str] = "default"

    NON_CONFIG_VARS: typing.ClassVar[list] = ["parent", "name", "scope"]

    # --- common hyperparameters (flax fields) ---
    img_shape: tuple = None              #: (c, h, w), reference ordering.
    action_size: int = 0
    tensor_value_range: tuple = (0.0, 1.0)
    action_conditional: bool = False
    compute_dtype: typing.Any = jnp.float32  #: set to jnp.bfloat16 for mixed precision.
    remat: bool = True  #: rematerialize scan bodies in backward (jax.checkpoint).

    # ------------------------------------------------------------------ #
    # shape helpers
    @property
    def img_c(self):
        return self.img_shape[0]

    @property
    def img_h(self):
        return self.img_shape[1]

    @property
    def img_w(self):
        return self.img_shape[2]

    @property
    def config(self) -> dict:
        r"""Complete model configuration as a flat dict (parity:
        ``base_model.py:71-85``). Used for run-config merging and for
        checkpoint reconstruction through the model registry."""
        from vp_suite_tpu.utils.utils import get_public_attrs
        attr_dict = {}
        for f in self.__dataclass_fields__:
            # flax's dataclass transform also registers ClassVar constants as
            # fields; skip them (uppercase) plus flax-internal fields
            if f in ("parent", "name") or f.isupper() \
                    or f in self.NON_CONFIG_VARS:
                continue
            v = getattr(self, f)
            if f == "compute_dtype":
                v = jnp.dtype(v).name if v is not None else None
            attr_dict[f] = v
        extra = get_public_attrs(self, "config", non_config_vars=self.NON_CONFIG_VARS
                                 + list(self.__dataclass_fields__), model_mode=True)
        img_c, img_h, img_w = self.img_shape
        attr_dict.update(extra)
        attr_dict.update({"img_h": img_h, "img_w": img_w, "img_c": img_c, "NAME": self.NAME})
        return attr_dict

    # ------------------------------------------------------------------ #
    # parameter / state management
    def init_params(self, rng, batch_size: int = 1, context_frames: int = None):
        r"""Initializes parameters with a dummy rollout. Returns a params pytree."""
        ctx = context_frames or max(self.MIN_CONTEXT_FRAMES, 2)
        total = ctx + 1 if self.NEEDS_COMPLETE_INPUT else ctx
        c, h, w = self.img_shape
        x = jnp.zeros((batch_size, total, h, w, c), dtype=jnp.float32)
        actions = jnp.zeros((batch_size, total + 1, self.action_size), dtype=jnp.float32) \
            if self.action_size else None
        variables = self.init({"params": rng, "sample": rng}, x, pred_frames=1, actions=actions)
        return variables["params"]

    def init_model_state(self) -> dict:
        r"""Functional replacement for the reference's mutable training-schedule
        attributes (e.g. ``predrnn_v2.py:124-126``). Returned dict is carried
        through training steps explicitly."""
        return {}

    # ------------------------------------------------------------------ #
    # data plumbing (static-shape slicing; usable inside jit)
    @staticmethod
    def unpack_data(batch: dict, config: dict, reverse: bool = False, complete: bool = False,
                    needs_complete_input: bool = False):
        r"""Extracts inputs/targets/actions from a batch dict (parity:
        ``base_model.py:87-114``). Frames: ``[b, T, h, w, c]``. With
        ``NEEDS_COMPLETE_INPUT`` or ``complete``, input frames include the
        to-be-predicted frames and targets alias the tail."""
        frames = batch["frames"]
        actions = batch.get("actions")
        if frames.dtype == jnp.uint8:
            # uint8 transfer fast path (BatchLoader(uint8_frames=True)):
            # dequantize on device
            frames = frames.astype(jnp.float32) / 255.0
        if frames.ndim == 4:
            frames = frames[None]
            if actions is not None:
                actions = actions[None]
        if reverse:
            frames = jnp.flip(frames, axis=1)
            if actions is not None:
                actions = jnp.flip(actions, axis=1)
        t_in, t_pred = config["context_frames"], config["pred_frames"]
        total = t_in + t_pred
        if needs_complete_input or complete:
            input_frames = frames[:, :total]
            target_frames = frames[:, t_in:total]
        else:
            input_frames = frames[:, :t_in]
            target_frames = frames[:, t_in:total]
        return input_frames, target_frames, actions

    # ------------------------------------------------------------------ #
    # prediction interface
    def pred_1(self, x, **kwargs):
        r"""Predicts a single future frame ``[b, h, w, c]`` from context
        ``[b, t, h, w, c]`` (parity: ``base_model.py:116-126``)."""
        preds, _ = self(x, pred_frames=1, **kwargs)
        return preds[:, 0]

    def __call__(self, x, pred_frames: int = 1, actions=None, train: bool = False, **kwargs):
        r"""Full rollout: ``[b, t, h, w, c] -> ([b, p, h, w, c], aux_losses)``.

        The default implementation autoregressively applies :meth:`_pred_1_impl`
        via ``lax.scan``-style unrolling. Subclasses typically override this
        entirely with a fused scan.
        """
        raise NotImplementedError

    # ------------------------------------------------------------------ #
    def to_model_layout(self, x_ncthw):
        r"""[b, t, c, h, w] -> [b, t, h, w, c] (host-side convenience)."""
        return jnp.transpose(x_ncthw, (0, 1, 3, 4, 2))

    def from_model_layout(self, x_nthwc):
        r"""[b, t, h, w, c] -> [b, t, c, h, w] (host-side convenience)."""
        return jnp.transpose(x_nthwc, (0, 1, 4, 2, 3))
