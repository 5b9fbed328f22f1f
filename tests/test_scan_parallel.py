r"""Sequence-parallel linear recurrence: exactness vs the single-device scan.

The time axis of ``h_t = f_t * h_{t-1} + u_t`` shards over a mesh axis
(blockwise associative scan + one aggregate all_gather + exclusive
prefix-combine, ``ops/scan_parallel.py``). These tests pin bit-level-close
equivalence with ``models/min_conv_rnn.linear_recurrence_scan`` on the
8-virtual-device CPU mesh, including h0 handling, gradients, and composition
with a batch-sharded data axis.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vp_suite_tpu.models.min_conv_rnn import linear_recurrence_scan
from vp_suite_tpu.ops.scan_parallel import (linear_recurrence_scan_sharded,
                                            sequence_sharding)
from vp_suite_tpu.parallel.mesh import make_mesh_nd

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _inputs(t=16, b=2, h=4, w=4, c=3, seed=0):
    rng = np.random.RandomState(seed)
    f = jax.nn.sigmoid(jnp.asarray(rng.randn(t, b, h, w, c), jnp.float32))
    u = jnp.asarray(rng.randn(t, b, h, w, c) * 0.3, jnp.float32)
    return f, u


def test_matches_single_device_scan():
    mesh = make_mesh_nd({"seq": 8})
    f, u = _inputs()
    ref = linear_recurrence_scan(f, u)
    out = jax.jit(lambda f, u: linear_recurrence_scan_sharded(f, u, mesh))(
        jax.device_put(f, sequence_sharding(mesh)),
        jax.device_put(u, sequence_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # the result stays sequence-sharded (no implicit gather)
    assert out.sharding.is_equivalent_to(sequence_sharding(mesh), out.ndim)


def test_h0_enters_block_zero():
    mesh = make_mesh_nd({"seq": 4})
    f, u = _inputs(t=8, seed=1)
    h0 = jnp.asarray(np.random.RandomState(2).randn(*f.shape[1:]), jnp.float32)
    ref = linear_recurrence_scan(f, u, h0=h0)
    out = linear_recurrence_scan_sharded(f, u, mesh, h0=h0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gradients_match():
    r"""The op must be differentiable (it sits inside a training graph):
    grads through the sharded path equal grads through the local scan."""
    mesh = make_mesh_nd({"seq": 8})
    f, u = _inputs(t=8, b=1, h=2, w=2, c=2, seed=3)

    def loss_ref(f, u):
        return jnp.sum(linear_recurrence_scan(f, u) ** 2)

    def loss_sh(f, u):
        return jnp.sum(linear_recurrence_scan_sharded(f, u, mesh) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1))(f, u)
    gs = jax.jit(jax.grad(loss_sh, argnums=(0, 1)))(f, u)
    for a, b in zip(gr, gs):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


def test_composes_with_data_axis():
    r"""seq x data 2-D mesh: time shards over 'seq' while batch shards over
    'data' — the collective stays on the seq axis only."""
    mesh = make_mesh_nd({"seq": 4, "data": 2})
    f, u = _inputs(t=8, b=4, seed=4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P("seq", "data"))
    ref = linear_recurrence_scan(f, u)
    out = jax.jit(lambda f, u: linear_recurrence_scan_sharded(
        f, u, mesh, spec=P("seq", "data")))(
        jax.device_put(f, sh), jax.device_put(u, sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_indivisible_time_raises():
    mesh = make_mesh_nd({"seq": 8})
    f, u = _inputs(t=12)
    with pytest.raises(ValueError, match="must divide"):
        linear_recurrence_scan_sharded(f, u, mesh)


def test_min_conv_rnn_context_parallel_matches():
    r"""Model-level integration: MinConvRNN(context_mesh=seq-mesh) encodes
    the context window with the TIME axis sharded over 8 devices and must
    produce the same predictions as the single-device associative scan."""
    from vp_suite_tpu.models import MODEL_CLASSES

    mesh = make_mesh_nd({"seq": 8})
    kwargs = dict(img_shape=(3, 16, 16), action_size=0,
                  tensor_value_range=(0.0, 1.0), num_layers=2, hidden_dim=16)
    base = MODEL_CLASSES["min-conv-rnn"](**kwargs)
    par = MODEL_CLASSES["min-conv-rnn"](**kwargs, context_mesh=mesh)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 8, 16, 16, 3), jnp.float32)
    variables = base.init({"params": jax.random.PRNGKey(0)}, x, pred_frames=2)
    ref, _ = base.apply(variables, x, pred_frames=2)
    out, _ = jax.jit(lambda v, x: par.apply(v, x, pred_frames=2))(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # context_mesh must stay out of the serializable model config
    assert "context_mesh" not in par.config
