r"""GPipe-style pipeline parallelism over a ``pp`` mesh axis.

The reference is single-device (``vp_suite/vpsuite.py:39-46``) — this is part
of the TPU-native scaling layer it lacks. Stages are laid out one per device
along the ``pp`` axis; microbatches stream through via ``ppermute`` over ICI
(the scaling-book recipe: neighbour exchanges, not all-to-all), and the whole
schedule is a single ``lax.scan`` under ``shard_map`` so XLA sees one
compiled loop with static shapes. Differentiable end to end: ``ppermute``
has a transpose rule (the reverse permutation), so ``jax.grad`` through
:func:`gpipe_apply` yields exactly the serial gradients — proven by
``tests/test_pipeline.py``.

Scope: uniform stages (same activation shape in/out), which covers the
natural pipelining target in this library — stacked recurrent layers (e.g.
the Encoder-Forecaster ConvLSTM/TrajGRU stacks of SURVEY.md §2.3, reference
``vp_suite/model_blocks/enc.py``) — plus any residual-style trunk. The
bubble fraction is the usual (S-1)/(M+S-1); choose ``n_micro >> n_stages``.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at the top level (check_vma kwarg)
    from jax import shard_map as _raw_shard_map
    _CHECK_KW = "check_vma"
except ImportError:  # pragma: no cover - older jax (check_rep kwarg)
    from jax.experimental.shard_map import shard_map as _raw_shard_map
    _CHECK_KW = "check_rep"


def _shard_map(f, mesh, in_specs, out_specs):
    return _raw_shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, **{_CHECK_KW: False})


def stack_stage_params(params_list):
    r"""Stacks a list of per-stage parameter pytrees (identical structure)
    into one pytree with a leading stage dim — the layout ``gpipe_apply``
    shards over the ``pp`` axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def gpipe_apply(stage_fn, stacked_params, x_mb, mesh: Mesh,
                axis_name: str = "pp"):
    r"""Runs ``S = mesh.shape[axis_name]`` stages as a GPipe pipeline over
    the microbatched input.

    Args:
      stage_fn: ``(params_i, x) -> y`` with ``y.shape == x.shape`` (uniform
        stages). Applied once per (stage, microbatch) pair.
      stacked_params: pytree whose leaves have a leading stage dim of size
        ``S`` (see :func:`stack_stage_params`); sharded one stage per device.
      x_mb: ``[n_micro, mb, ...]`` microbatched input (replicated; only
        stage 0 reads it).
      mesh / axis_name: the mesh and its pipeline axis.

    Returns:
      ``[n_micro, mb, ...]`` — ``stage_{S-1}(... stage_0(x))`` per
      microbatch, replicated over the ``pp`` axis.

    Schedule: step ``t`` has stage ``k`` computing microbatch ``t - k``
    (valid when ``0 <= t - k < M``), so the scan runs ``M + S - 1`` steps;
    activations hop one stage per step via ``ppermute``. Invalid (bubble)
    lanes compute on zeros — NOT garbage — so no NaN can leak into the
    backward pass through the ``jnp.where`` selects.
    """
    S = mesh.shape[axis_name]
    M = x_mb.shape[0]
    if S == 1:
        def apply_one(x):
            p0 = jax.tree_util.tree_map(lambda p: p[0], stacked_params)
            return stage_fn(p0, x)
        return jax.vmap(apply_one)(x_mb)

    def worker(params, x):
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        idx = jax.lax.axis_index(axis_name)
        perm = [(i, i + 1) for i in range(S - 1)]

        def step(prev_out, t):
            recv = jax.lax.ppermute(prev_out, axis_name, perm)
            # stage 0 reads microbatch t from the input stream; others take
            # the neighbour's activation. Bubble lanes get zeros.
            first_in = x[jnp.clip(t, 0, M - 1)]
            my_in = jnp.where(idx == 0, first_in, recv)
            valid = (t - idx >= 0) & (t - idx < M)
            my_in = jnp.where(valid, my_in, jnp.zeros_like(my_in))
            out = stage_fn(params, my_in)
            out = jnp.where(valid, out, jnp.zeros_like(out))
            emit = jnp.where(idx == S - 1, out, jnp.zeros_like(out))
            return out, emit

        _, ys = jax.lax.scan(step, jnp.zeros_like(x[0]),
                             jnp.arange(M + S - 1))
        # only the last stage emitted non-zeros; psum replicates its stream
        ys = jax.lax.psum(ys, axis_name)
        return ys[S - 1:]

    p_specs = jax.tree_util.tree_map(lambda _: P(axis_name), stacked_params)
    fn = _shard_map(worker, mesh, in_specs=(p_specs, P()), out_specs=P())
    return fn(stacked_params, x_mb)


def microbatch(x, n_micro: int):
    r"""Splits a ``[batch, ...]`` array into ``[n_micro, batch/n_micro, ...]``."""
    b = x.shape[0]
    if b % n_micro != 0:
        raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
    return x.reshape((n_micro, b // n_micro) + x.shape[1:])
