r"""Sequence-parallel linear recurrence over a mesh axis.

``MinConvRNN``'s context encoding is an element-wise LINEAR recurrence
``h_t = f_t * h_{t-1} + u_t`` evaluated time-parallel by
``lax.associative_scan`` (``models/min_conv_rnn.py``). Because the
recurrence is associative, the TIME axis itself can shard over a device
mesh — the "natural extension" SURVEY §5.7 notes no reference model can
express (the torch reference steps time strictly sequentially,
e.g. ``vp_suite/model_blocks/conv_lstm_hzzone.py:52-69``):

1. each device runs the log-depth scan on its local time block;
2. per-block aggregates ``(F, U) = (prod f, last h_local)`` — one
   [b, h, w, c] pair per device — are exchanged with a single
   ``all_gather`` over the sequence axis (tiny: aggregates carry no time
   dimension, so the collective moves 1/T_block of the activations);
3. an exclusive prefix-combine over the gathered aggregates (a static
   n_seq-step element-wise loop, microseconds of VPU work) yields each
   block's incoming hidden state, which corrects the local prefix as
   ``h = h_local + carry_in * cumprod(f)``.

Depth: O(log T_block) + O(n_seq) element-wise, vs O(log T) single-device —
but the activations, gate convs, and scan combines all shard n_seq-ways.
Exactness (not an approximation) is pinned by ``tests/test_scan_parallel.py``
against the single-device scan on the virtual 8-device mesh.
"""
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from vp_suite_tpu.parallel.pipeline import _shard_map


def _combine(a, b):
    r"""Composition of (decay, update) pairs: apply ``a`` then ``b``."""
    fa, ua = a
    fb, ub = b
    return fa * fb, ub + fb * ua


def linear_recurrence_scan_sharded(f, u, mesh, axis="seq", h0=None, spec=None):
    r"""``h_t = f_t * h_{t-1} + u_t`` with the TIME axis sharded over
    ``mesh[axis]``.

    Args:
        f, u: [t, ...] stacked decay/update tensors, time-major. ``t`` must
            divide the ``axis`` size.
        mesh: the device mesh holding ``axis``.
        axis: mesh axis name the time dimension shards over.
        h0: optional initial hidden state ``[...]`` (broadcast against
            ``f[0]``); enters as block 0's incoming carry.
        spec: optional full ``PartitionSpec`` for ``f``/``u`` when OTHER dims
            shard too (e.g. ``P('seq', 'data')`` on a seq x data mesh — the
            aggregate collective still rides only the ``axis`` ring). First
            entry must be ``axis``. Default: time-only sharding.

    Returns:
        h: [t, ...] inclusive-scan hidden states, sharded like the inputs.
    """
    if spec is None:
        spec = P(axis)
    if spec[0] != axis:
        raise ValueError(f"spec {spec} must put '{axis}' on the time dim")
    h0_spec = P(*spec[1:]) if len(spec) > 1 else P()
    n_seq = mesh.shape[axis]
    if f.shape[0] % n_seq:
        raise ValueError(f"time dim {f.shape[0]} must divide mesh axis "
                         f"'{axis}' of size {n_seq}")
    if h0 is None:
        h0 = jnp.zeros(f.shape[1:], f.dtype)

    def blockwise(f_blk, u_blk, h0_full):
        # local inclusive scan (log-depth in the block length)
        _, h_local = lax.associative_scan(_combine, (f_blk, u_blk), axis=0)
        cumf = lax.associative_scan(jnp.multiply, f_blk, axis=0)
        # block aggregates: applying the whole block to an incoming carry c
        # gives h_last = cumf[-1] * c + h_local[-1]
        F_all = lax.all_gather(cumf[-1], axis)      # [n_seq, ...]
        U_all = lax.all_gather(h_local[-1], axis)   # [n_seq, ...]
        # exclusive prefix-combine: carry entering THIS block = h0 advanced
        # through blocks 0..idx-1 (static element-wise loop over n_seq)
        idx = lax.axis_index(axis)
        carry_f = jnp.ones_like(F_all[0])
        carry_u = jnp.broadcast_to(h0_full, U_all[0].shape).astype(U_all.dtype)
        for j in range(n_seq):
            nf, nu = _combine((carry_f, carry_u), (F_all[j], U_all[j]))
            take = j < idx
            carry_f = jnp.where(take, nf, carry_f)
            carry_u = jnp.where(take, nu, carry_u)
        return h_local + carry_u * cumf

    fn = _shard_map(blockwise, mesh,
                    in_specs=(spec, spec, h0_spec), out_specs=spec)
    return fn(f, u, h0)


def sequence_sharding(mesh, axis="seq"):
    r"""NamedSharding placing a time-major ``[t, ...]`` tensor's time axis on
    ``mesh[axis]`` (inputs to :func:`linear_recurrence_scan_sharded`)."""
    from jax.sharding import NamedSharding
    return NamedSharding(mesh, P(axis))
