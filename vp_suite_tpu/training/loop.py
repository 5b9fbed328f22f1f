r"""Compiled training / evaluation steps.

TPU-native replacement for the reference's per-model ``train_iter`` /
``eval_iter`` Python loops (``vp_suite/base/base_model.py:148-216`` plus the
overrides in phydnet/st_phy/predrnn_v2): each model's training regime becomes
a pure step function built once and ``jax.jit``-compiled; the whole
fwd→loss→bwd→update happens on-device, with data parallelism expressed purely
through input shardings (batch sharded, params replicated → XLA emits the
gradient ``psum`` over the mesh's ICI automatically).
"""
import jax
import jax.numpy as jnp
import optax

from vp_suite_tpu.base.base_model import VPModel


def _dequantize(x):
    r"""Dequantizes uint8-transferred frames to f32 [0, 1] on device (the
    loader's ``uint8_frames`` fast path — 4x less host->device traffic)."""
    if x is not None and x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


def _apply_model(model, params, extra_vars, x, *args, train=False, rngs=None, **kwargs):
    r"""Applies a model, handling mutable collections (e.g. batch_stats) and
    the mixed-precision policy: activations are cast to ``model.compute_dtype``
    (bfloat16 keeps the MXU fed at full rate and halves HBM traffic) while
    params stay f32 and the returned predictions are cast back to f32 so the
    loss/backward accumulate in full precision."""
    cd = getattr(model, "compute_dtype", None)
    cast = cd is not None and cd != jnp.float32
    if cast:
        x = x.astype(cd)

    def _uncast(out):
        preds, aux = out
        if cast:
            preds = preds.astype(jnp.float32)
            if aux is not None:
                aux = {k: v.astype(jnp.float32) if hasattr(v, "astype") else v
                       for k, v in aux.items()}
        return preds, aux

    variables = {"params": params, **extra_vars}
    mutable = [k for k in extra_vars.keys()] if train and extra_vars else False
    if not model.TRAINABLE:
        return _uncast(model.apply({}, x, *args, train=train, **kwargs)), extra_vars
    if mutable:
        (out, new_vars) = model.apply(variables, x, *args, train=train, mutable=mutable,
                                      rngs=rngs, **kwargs)
        return _uncast(out), dict(new_vars)
    out = model.apply(variables, x, *args, train=train, rngs=rngs, **kwargs)
    return _uncast(out), extra_vars


def make_train_step(model: VPModel, run_config: dict, optimizer, loss_provider,
                    use_jit: bool = True, donate: bool = True,
                    accum_steps: int = 1):
    r"""Builds the jitted train step for a model's TRAIN_REGIME.

    Step signature: ``(state, batch, epoch) -> (state, metrics_dict)``.
    ``batch``: {'frames': [b, T, h, w, c], 'actions': [b, T, a]}.

    ``accum_steps > 1`` = gradient accumulation: the batch is split into
    ``k`` interleaved microbatches (sample ``j`` goes to microbatch
    ``j % k``, so a data-sharded batch keeps every device evenly busy in
    every microbatch), gradients are averaged in a ``lax.scan``, and ONE
    optimizer update is applied — the mean-loss gradient of the full batch
    at 1/k the activation memory. model_state (e.g. the scheduled-sampling
    schedule) advances once per optimizer step, not per microbatch; mutable
    collections (batch stats) come from the first microbatch.
    """
    ctx = run_config["context_frames"]
    pred = run_config["pred_frames"]
    use_actions = run_config.get("use_actions", False) and model.CAN_HANDLE_ACTIONS \
        and model.action_conditional
    regime = model.TRAIN_REGIME
    cfg = {"context_frames": ctx, "pred_frames": pred}

    def compute_loss(preds, targets, aux_losses):
        loss_values, total = loss_provider.get_losses(preds, targets)
        if aux_losses is not None:
            for v in aux_losses.values():
                total = total + v
        return total, loss_values

    def default_loss_fn(params, extra_vars, batch, rng, model_state, epoch):
        inputs, targets, actions = VPModel.unpack_data(
            batch, cfg, needs_complete_input=model.NEEDS_COMPLETE_INPUT)
        kw = {"actions": actions} if use_actions or model.CAN_HANDLE_ACTIONS else {}
        (preds, aux), new_vars = _apply_model(model, params, extra_vars, inputs,
                                              pred_frames=pred, train=True,
                                              rngs={"sample": rng}, **kw)
        total, loss_values = compute_loss(preds, targets, aux)
        return total, (loss_values, new_vars, model_state)

    def teacher_forcing_loss_fn(params, extra_vars, batch, rng, model_state, epoch):
        # parity: phydnet.py:139-174 / st_phy.py:183-216 — whole sequence in,
        # targets from 2nd frame, per-batch teacher-forcing coin flip with
        # ratio max(0, 1 - epoch*decay)
        inputs, _, actions = VPModel.unpack_data(batch, cfg, complete=True)
        ratio = jnp.maximum(0.0, 1.0 - epoch * model.teacher_forcing_decay)
        tf_rng, apply_rng = jax.random.split(rng)
        teacher_forcing = (jax.random.uniform(tf_rng) < ratio).astype(jnp.float32)
        kw = {"actions": actions} if use_actions or model.CAN_HANDLE_ACTIONS else {}
        (preds, aux), new_vars = _apply_model(model, params, extra_vars, inputs,
                                              pred_frames=pred, train=True,
                                              teacher_forcing=teacher_forcing,
                                              rngs={"sample": apply_rng}, **kw)
        targets = inputs[:, 1:]
        total, loss_values = compute_loss(preds, targets, aux)
        return total, (loss_values, new_vars, model_state)

    def scheduled_sampling_loss_fn(params, extra_vars, batch, rng, model_state, epoch):
        # parity: predrnn_v2.py:319-365 — scheduled-sampling mask per forward,
        # optional reversed-input second pass averaged in. TPU-first: the
        # forward and reversed passes share the parameters, so they run as
        # ONE batched apply at 2x batch — same FLOPs and the same mean loss
        # ((mean_fwd + mean_rev)/2 == mean over the concat for equal halves),
        # but half the per-op overhead of two sequential scans (the ST-LSTM
        # step is op-count-bound around convs already at MXU peak).
        inputs, targets, actions = VPModel.unpack_data(
            batch, cfg, needs_complete_input=True)
        b = inputs.shape[0]
        r1, r2, apply_rng = jax.random.split(rng, 3)
        mask, model_state = model.scheduled_sampling_mask(model_state, r1, b, ctx, pred,
                                                          train=True)
        kw = {"actions": actions} if use_actions else {}
        if model.reverse_input:
            inputs_rev, targets_rev, actions_rev = VPModel.unpack_data(
                batch, cfg, reverse=True, needs_complete_input=True)
            mask2, model_state = model.scheduled_sampling_mask(model_state, r2, b, ctx,
                                                               pred, train=True)
            inputs = jnp.concatenate([inputs, inputs_rev], axis=0)
            targets = jnp.concatenate([targets, targets_rev], axis=0)
            mask = jnp.concatenate([mask, mask2], axis=0)
            if use_actions:
                kw = {"actions": jnp.concatenate([actions, actions_rev], axis=0)}
        (preds, aux), new_vars = _apply_model(model, params, extra_vars, inputs,
                                              pred_frames=pred, train=True,
                                              mask_true=mask, rngs={"sample": apply_rng},
                                              **kw)
        total, loss_values = compute_loss(preds, targets, aux)
        model_state = {**model_state,
                       "training_iteration": model_state["training_iteration"] + 1}
        return total, (loss_values, new_vars, model_state)

    loss_fn = {"default": default_loss_fn,
               "teacher_forcing": teacher_forcing_loss_fn,
               "scheduled_sampling": scheduled_sampling_loss_fn}[regime]

    def _accum_grads(state, batch, epoch, step_rng):
        r"""k-microbatch gradient accumulation; returns the same tuple shape
        as a single grad_fn call, with grads/losses averaged over k."""
        k = accum_steps
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        b = batch["frames"].shape[0]
        if b % k != 0:
            raise ValueError(f"batch {b} not divisible by accum_steps {k}")
        # [b, ...] -> [b/k, k, ...]: microbatch i takes samples j*k+i, an
        # interleaving that preserves the 'data'-axis block layout of each
        # device (no resharding — requires (b / n_devices) % k == 0, which
        # VPSuite.train validates)
        batch_r = {key: v.reshape((b // k, k) + v.shape[1:])
                   for key, v in batch.items()}
        rngs = jax.random.split(step_rng, k)
        mb0 = {key: v[:, 0] for key, v in batch_r.items()}
        # zero accumulators with the right structure WITHOUT tracing the
        # loss twice: eval_shape is trace-only (no compile, no execution)
        out_shapes = jax.eval_shape(grad_fn, state.params, state.extra_vars,
                                    mb0, rngs[0], state.model_state, epoch)
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), out_shapes)
        (t0, (lv0, nv0, ms0)), g0 = zeros

        def body(carry, i):
            g_acc, t_acc, lv_acc, nv_acc, ms_acc = carry
            mb = {key: v[:, i] for key, v in batch_r.items()}
            (t, (lv, nv, ms)), g = grad_fn(state.params, state.extra_vars, mb,
                                           rngs[i], state.model_state, epoch)
            first = i == 0  # mutable collections / schedule from microbatch 0
            pick = lambda a, b: jax.tree_util.tree_map(
                lambda x, y: jnp.where(first, x, y), a, b)
            return (jax.tree_util.tree_map(jnp.add, g_acc, g), t_acc + t,
                    jax.tree_util.tree_map(jnp.add, lv_acc, lv),
                    pick(nv, nv_acc), pick(ms, ms_acc)), None

        (g_sum, t_sum, lv_sum, new_vars, model_state), _ = jax.lax.scan(
            body, (g0, t0, lv0, nv0, ms0), jnp.arange(k))
        grads = jax.tree_util.tree_map(lambda x: x / k, g_sum)
        total = t_sum / k
        loss_values = jax.tree_util.tree_map(lambda x: x / k, lv_sum)
        return (total, (loss_values, new_vars, model_state)), grads

    def train_step(state, batch, epoch):
        rng, step_rng = jax.random.split(state.rng)
        if accum_steps > 1:
            (total, (loss_values, new_vars, model_state)), grads = _accum_grads(
                state, batch, epoch, step_rng)
        else:
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (total, (loss_values, new_vars, model_state)), grads = grad_fn(
                state.params, state.extra_vars, batch, step_rng,
                state.model_state, epoch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, extra_vars=new_vars,
                                  opt_state=opt_state, step=state.step + 1,
                                  model_state=model_state, rng=rng)
        metrics = {"total": total, **loss_values}
        return new_state, metrics

    if use_jit:
        train_step = jax.jit(train_step, donate_argnums=(0,) if donate else ())
    return train_step


def make_eval_step(model: VPModel, run_config: dict, loss_provider, use_jit: bool = True):
    r"""Builds the jitted eval step: ``(state, batch) -> loss_values_dict``
    (parity: ``base_model.py:181-216``)."""
    ctx = run_config["context_frames"]
    pred = run_config["pred_frames"]
    cfg = {"context_frames": ctx, "pred_frames": pred}
    use_actions = run_config.get("use_actions", False) and model.CAN_HANDLE_ACTIONS \
        and model.action_conditional

    def eval_step(state, batch):
        inputs, targets, actions = VPModel.unpack_data(
            batch, cfg, needs_complete_input=model.NEEDS_COMPLETE_INPUT)
        kw = {"actions": actions} if use_actions or model.CAN_HANDLE_ACTIONS else {}
        (preds, _), _ = _apply_model(model, state.params, state.extra_vars, inputs,
                                     pred_frames=pred, train=False, **kw)
        loss_values, total = loss_provider.get_losses(preds, targets)
        return {"total": total, **loss_values}

    if use_jit:
        eval_step = jax.jit(eval_step)
    return eval_step


def make_predict_fn(model: VPModel, run_config: dict, use_jit: bool = True):
    r"""Builds the jitted inference fn: ``(state, frames, actions) -> preds``."""
    ctx = run_config["context_frames"]
    pred = run_config["pred_frames"]
    cfg = {"context_frames": ctx, "pred_frames": pred}

    def predict(state, batch):
        inputs, targets, actions = VPModel.unpack_data(
            batch, cfg, needs_complete_input=model.NEEDS_COMPLETE_INPUT)
        kw = {"actions": actions} if model.CAN_HANDLE_ACTIONS else {}
        (preds, _), _ = _apply_model(model, state.params, state.extra_vars, inputs,
                                     pred_frames=pred, train=False, **kw)
        return preds, targets

    if use_jit:
        predict = jax.jit(predict)
    return predict
