r"""Spatial (image-row) sharding via explicit halo-exchange convs.

XLA's SPMD partitioner miscompiles spatially-sharded convs on this version
(pinned in tests/test_parallel.py); ``parallel/spatial.py`` sidesteps its
conv-partitioning pass with shard_map + ppermute halo exchange. These tests
pin: (a) op-level forward/grad equality with the dense convs for every
geometry the model zoo uses, (b) FULL EF-ConvLSTM train-step equality on a
data x sp mesh — the thing the XLA bug makes impossible with plain GSPMD.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vp_suite_tpu.model_blocks._functional import conv2d, conv_transpose2d
from vp_suite_tpu.models import MODEL_CLASSES
from vp_suite_tpu.parallel.mesh import (make_mesh_nd, shard_params,
                                        video_batch_sharding, check_train_mesh)
from vp_suite_tpu.parallel.spatial import (halo_conv2d, halo_conv_transpose2d,
                                           spatial_halo_convs)

CONV_GEOMS = [(3, 1, 1), (3, 2, 1), (4, 2, 1), (1, 1, 0), (5, 1, 2),
              (5, 2, 2), (2, 2, 0)]
CONVT_GEOMS = [(3, 2, 1, 1), (4, 2, 1, 0), (3, 1, 1, 0), (2, 2, 0, 0)]


@pytest.fixture(scope="module")
def mesh():
    return make_mesh_nd({"data": 2, "sp": 4})


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape)
                       .astype(np.float32))


@pytest.mark.parametrize("kh,s,p", CONV_GEOMS)
def test_halo_conv2d_matches_dense(mesh, kh, s, p):
    x = _rand(2, 16, 8, 3)
    k = _rand(kh, kh, 3, 4, seed=1)
    b = _rand(4, seed=2)
    ref = conv2d(x, k, b, s, p)
    got = halo_conv2d(x, k, b, s, p, mesh, "sp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("kh,s,p,op", CONVT_GEOMS)
def test_halo_convT_matches_dense(mesh, kh, s, p, op):
    x = _rand(2, 16, 8, 3)
    k = _rand(kh, kh, 3, 4, seed=1)
    b = _rand(4, seed=2)
    ref = conv_transpose2d(x, k, b, s, p, op)
    got = halo_conv_transpose2d(x, k, b, s, p, op, mesh, "sp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("transposed", [False, True])
def test_halo_grads_match_dense(mesh, transposed):
    r"""VJPs through the shard_map region (ppermute transposes route halo
    cotangents back to their owners) equal the dense convs'."""
    x = _rand(2, 16, 8, 3)
    k = _rand(3, 3, 3, 4, seed=1)
    b = _rand(4, seed=2)
    if transposed:
        ref_fn = lambda x, k, b: (conv_transpose2d(x, k, b, 2, 1, 1) ** 2).sum()
        halo_fn = lambda x, k, b: (halo_conv_transpose2d(
            x, k, b, 2, 1, 1, mesh, "sp") ** 2).sum()
    else:
        ref_fn = lambda x, k, b: (conv2d(x, k, b, 2, 1) ** 2).sum()
        halo_fn = lambda x, k, b: (halo_conv2d(x, k, b, 2, 1, mesh, "sp") ** 2).sum()
    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2))(x, k, b)
    g_halo = jax.jit(jax.grad(halo_fn, argnums=(0, 1, 2)))(x, k, b)
    for r, h, name in zip(g_ref, g_halo, ["d_x", "d_k", "d_b"]):
        np.testing.assert_allclose(np.asarray(h), np.asarray(r),
                                   atol=1e-2, rtol=1e-4, err_msg=name)


def test_unsupported_geometry_raises(mesh):
    x = _rand(2, 16, 8, 3)
    k = _rand(3, 3, 3, 4, seed=1)
    with pytest.raises(NotImplementedError, match="kh - 2"):
        halo_conv2d(x, k, None, 2, 0, mesh, "sp")  # kh-2p=3 > s=2
    with pytest.raises(NotImplementedError, match="output_padding"):
        halo_conv_transpose2d(x, k, None, 2, 1, 0, mesh, "sp")  # op != s+2p-kh


def test_too_fine_slab_raises(mesh):
    x = _rand(2, 4, 8, 3)  # 1 row per shard over sp=4
    k = _rand(3, 3, 3, 4, seed=1)
    with pytest.raises(ValueError, match="too fine"):
        halo_conv2d(x, k, None, 1, 1, mesh, "sp")


def _setup_ef(opt="sgd"):
    IMG, CTX, PRED = 16, 2, 2
    from vp_suite_tpu.training.train_state import create_train_state
    from vp_suite_tpu.training.loop import make_train_step
    from vp_suite_tpu.measure.loss_provider import PredictionLossProvider
    model = MODEL_CLASSES["convlstm-shi"](img_shape=(3, IMG, IMG),
                                          action_size=0,
                                          tensor_value_range=(0.0, 1.0))
    run_config = {"context_frames": CTX, "pred_frames": PRED,
                  "use_actions": False}
    optimizer = optax.inject_hyperparams(getattr(optax, opt))(learning_rate=1e-3)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               context_frames=CTX, pred_frames=PRED)
    lp = PredictionLossProvider({"losses_and_scales": {"mse": 1.0},
                                 "img_c": 3, "device": None})

    def make_step():
        return make_train_step(model, run_config, optimizer, lp, donate=False)

    rng = np.random.RandomState(0)
    batch_np = {"frames": rng.rand(4, CTX + PRED, IMG, IMG, 3).astype(np.float32),
                "actions": np.zeros((4, CTX + PRED, 1), np.float32)}
    return state, make_step, batch_np


def test_sp_train_step_matches_single_device():
    r"""THE payoff test: one EF-ConvLSTM SGD train step over a data x sp
    mesh inside the halo-conv context equals the single-device step at 1e-5
    — spatial sharding is train-capable despite the pinned XLA bug (which
    doubles d_kernel on the plain GSPMD path,
    test_parallel.test_xla_sp_dkernel_doubling_is_still_present)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    state0, make_step, batch_np = _setup_ef()

    db1 = {k: jax.device_put(v) for k, v in batch_np.items()}
    s1, m1 = make_step()(state0, db1, jnp.asarray(0.0))

    # sp=2 at IMG=16: the deepest cell layer (4x4) keeps 2 rows per shard
    mesh = make_mesh_nd({"data": 4, "sp": 2})
    state_sh = state0.replace(params=shard_params(state0.params, mesh),
                              opt_state=shard_params(state0.opt_state, mesh),
                              extra_vars=shard_params(state0.extra_vars, mesh))
    db = {"frames": jax.device_put(batch_np["frames"],
                                   video_batch_sharding(mesh)),
          "actions": jax.device_put(batch_np["actions"],
                                    NamedSharding(mesh, P("data")))}
    with spatial_halo_convs(mesh):
        check_train_mesh(mesh)  # guard lifts inside the context
        s2, m2 = make_step()(state_sh, db, jnp.asarray(0.0))

    assert abs(float(m1["total"]) - float(m2["total"])) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_sp_guard_still_active_outside_context():
    mesh = make_mesh_nd({"data": 4, "sp": 2})
    with pytest.raises(ValueError, match="inference-only"):
        check_train_mesh(mesh)
