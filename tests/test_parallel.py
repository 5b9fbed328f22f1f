r"""Multi-device data-parallelism tests (virtual 8-device CPU mesh).

A tier the reference lacks (it is single-device; SURVEY.md §2.9): verifies
that the jitted train step compiles and executes over a sharded mesh and that
data-parallel gradients equal single-device gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vp_suite_tpu.models import MODEL_CLASSES
from vp_suite_tpu.parallel.mesh import (make_mesh, shard_params, batch_sharding,
                                        replicated_sharding, make_mesh_nd,
                                        factorize_mesh, video_batch_sharding,
                                        shard_params_tp)
from vp_suite_tpu.training.train_state import create_train_state
from vp_suite_tpu.training.loop import make_train_step
from vp_suite_tpu.measure.loss_provider import PredictionLossProvider

IMG, CTX, PRED = 16, 2, 2


def _setup(n_dev, opt="adam", **model_kwargs):
    model = MODEL_CLASSES["convlstm-shi"](img_shape=(3, IMG, IMG), action_size=0,
                                          tensor_value_range=(0.0, 1.0),
                                          **model_kwargs)
    run_config = {"context_frames": CTX, "pred_frames": PRED, "use_actions": False}
    optimizer = optax.inject_hyperparams(getattr(optax, opt))(learning_rate=1e-3)
    state = create_train_state(model, optimizer, jax.random.PRNGKey(0),
                               context_frames=CTX, pred_frames=PRED)
    loss_provider = PredictionLossProvider(
        {"losses_and_scales": {"mse": 1.0}, "img_c": 3, "device": None})
    step = make_train_step(model, run_config, optimizer, loss_provider, donate=False)
    batch = 2 * max(n_dev, 1)
    rng = np.random.RandomState(0)
    batch_np = {
        "frames": rng.rand(batch, CTX + PRED, IMG, IMG, 3).astype(np.float32),
        "actions": np.zeros((batch, CTX + PRED, 1), np.float32),
    }
    return model, state, step, batch_np


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8, \
        "conftest should have forced 8 virtual CPU devices"


def test_sharded_train_step_runs():
    n_dev = 8
    mesh = make_mesh(n_dev)
    model, state, step, batch_np = _setup(n_dev)
    state = state.replace(params=shard_params(state.params, mesh),
                          opt_state=shard_params(state.opt_state, mesh),
                          extra_vars=shard_params(state.extra_vars, mesh))
    sharding = batch_sharding(mesh)
    device_batch = {k: jax.device_put(v, sharding) for k, v in batch_np.items()}
    new_state, metrics = step(state, device_batch, jnp.asarray(0.0))
    assert np.isfinite(float(metrics["total"]))
    assert int(new_state.step) == 1
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_data_parallel_matches_single_device():
    r"""The sharded-batch gradient update must equal the single-device one
    (the implicit psum does the all-reduce correctly)."""
    mesh = make_mesh(8)
    model, state0, step, batch_np = _setup(8)

    # single device
    db1 = {k: jax.device_put(v) for k, v in batch_np.items()}
    s1, m1 = step(state0, db1, jnp.asarray(0.0))

    # 8-way sharded
    sharding = batch_sharding(mesh)
    state_sh = state0.replace(params=shard_params(state0.params, mesh),
                              opt_state=shard_params(state0.opt_state, mesh),
                              extra_vars=shard_params(state0.extra_vars, mesh))
    db8 = {k: jax.device_put(v, sharding) for k, v in batch_np.items()}
    s8, m8 = step(state_sh, db8, jnp.asarray(0.0))

    assert abs(float(m1["total"]) - float(m8["total"])) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_factorize_mesh():
    assert factorize_mesh(8) == {"data": 4, "sp": 1, "tp": 2}  # tp default
    assert factorize_mesh(8, "sp") == {"data": 4, "sp": 2, "tp": 1}
    assert factorize_mesh(2, "sp") == {"data": 1, "sp": 2, "tp": 1}
    assert factorize_mesh(1) == {"data": 1, "sp": 1, "tp": 1}
    assert factorize_mesh(7) == {"data": 7, "sp": 1, "tp": 1}  # prime -> pure DP
    for n in (1, 2, 3, 4, 6, 7, 8):
        for s in ("sp", "tp"):
            ax = factorize_mesh(n, s)
            assert np.prod(list(ax.values())) == n
            assert not (ax["sp"] > 1 and ax["tp"] > 1)


def _shard_state_and_batch_nd(mesh, state, batch_np):
    from jax.sharding import NamedSharding, PartitionSpec as P
    state = state.replace(params=shard_params_tp(state.params, mesh),
                          opt_state=shard_params_tp(state.opt_state, mesh),
                          extra_vars=shard_params(state.extra_vars, mesh))
    frames_sh = video_batch_sharding(mesh)
    act_sh = NamedSharding(mesh, P("data"))
    device_batch = {"frames": jax.device_put(batch_np["frames"], frames_sh),
                    "actions": jax.device_put(batch_np["actions"], act_sh)}
    return state, device_batch


def test_dp_tp_train_step_matches_single_device():
    r"""One train step over a data x tp mesh (batch over 'data', conv
    out-channels Megatron-style over 'tp') must match the single-device step
    — GSPMD shardings may not change semantics. SGD (not Adam): Adam's
    step-1 update is ~lr*sign(g), which would amplify a near-zero-gradient
    reassociation sign flip to 2*lr; SGD keeps the param diff proportional
    to the grad diff, which is what we assert."""
    mesh = make_mesh_nd(factorize_mesh(4, "tp"))
    model, state0, step, batch_np = _setup(2, opt="sgd")  # batch 4, data=2

    db1 = {k: jax.device_put(v) for k, v in batch_np.items()}
    s1, m1 = step(state0, db1, jnp.asarray(0.0))

    state_sh, db_nd = _shard_state_and_batch_nd(mesh, state0, batch_np)
    s_nd, m_nd = step(state_sh, db_nd, jnp.asarray(0.0))

    assert abs(float(m1["total"]) - float(m_nd["total"])) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s_nd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_dp_sp_forward_matches_single_device():
    r"""The FORWARD/eval pass over a data x sp mesh (image height sharded;
    XLA inserts the conv halo exchanges) must match single-device — this is
    the inference-only contract for spatial meshes (training is guarded off,
    see test_xla_sp_dkernel_doubling_is_still_present)."""
    mesh = make_mesh_nd(factorize_mesh(4, "sp"))
    model, state0, step, batch_np = _setup(2)

    def fwd_loss(params, frames):
        x, tgt = frames[:, :CTX], frames[:, CTX:]
        preds, _ = model.apply({"params": params, **state0.extra_vars},
                               x, pred_frames=PRED)
        return jnp.mean((preds - tgt) ** 2)

    fwd = jax.jit(fwd_loss)
    ref = float(fwd(state0.params, jnp.asarray(batch_np["frames"])))
    out = float(fwd(shard_params(state0.params, mesh),
                    jax.device_put(batch_np["frames"],
                                   video_batch_sharding(mesh))))
    assert abs(ref - out) < 1e-4 * max(1.0, abs(ref))


def test_xla_sp_dkernel_doubling_is_still_present():
    r"""Pins the upstream XLA bug that makes spatial meshes inference-only:
    training the EF-ConvLSTM graph with a spatially-sharded batch and
    REPLICATED params doubles (factor = sp size) most conv d_kernels —
    XLA all-gathers the activations for the kernel-grad conv, then still
    all-reduces the 'partial' result over sp. Bias/peephole grads stay
    exact, so the forward and dy are fine; only d_kernel is corrupted.
    Minimal graphs (lone stride-2 conv, conv-in-remat-scan, conv_transpose)
    do NOT trigger it — and neither does the INTERLEAVED EF graph (the
    round-5 default; see test_sp_train_exact_on_interleaved_default), so the
    pin runs the staged form explicitly. If this test FAILS, XLA fixed the
    bug — lift check_train_mesh's sp guard and re-enable spatial training
    for all graphs."""
    from vp_suite_tpu.parallel.mesh import check_train_mesh
    mesh = make_mesh_nd(factorize_mesh(4, "sp"))
    with pytest.raises(ValueError, match="inference-only"):
        check_train_mesh(mesh)

    model, state0, step, batch_np = _setup(2, opt="sgd",
                                           interleaved_forecast=False,
                                           interleaved_encode=False)
    db1 = {k: jax.device_put(v) for k, v in batch_np.items()}
    s1, _ = step(state0, db1, jnp.asarray(0.0))
    state_sh, db_nd = _shard_state_and_batch_nd(mesh, state0, batch_np)
    s_sp, _ = step(state_sh, db_nd, jnp.asarray(0.0))

    max_d = max(float(jnp.max(jnp.abs(a - b))) for a, b in
                zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s_sp.params)))
    assert max_d > 1e-5, (
        f"sp-sharded train step now matches single-device (max|d|={max_d}) "
        "— the XLA d_kernel doubling bug is fixed; lift the sp guard in "
        "parallel/mesh.py check_train_mesh")


def test_sp_train_exact_on_interleaved_default():
    r"""The INTERLEAVED EF graph (the auto-default since round 5) does NOT
    trigger the XLA sp d_kernel doubling: a spatially-sharded train step
    matches single-device to float tolerance with plain XLA SPMD partitioning
    (no halo-exchange rewrite needed). The staged graph remains corrupted
    (see the pin above), so check_train_mesh keeps its guard — this test
    documents the interleaved carve-out and will keep it honest if the
    interleaved lowering ever changes."""
    mesh = make_mesh_nd(factorize_mesh(4, "sp"))
    model, state0, step, batch_np = _setup(2, opt="sgd",
                                           interleaved_forecast=True,
                                           interleaved_encode=True)
    db1 = {k: jax.device_put(v) for k, v in batch_np.items()}
    s1, m1 = step(state0, db1, jnp.asarray(0.0))
    state_sh, db_nd = _shard_state_and_batch_nd(mesh, state0, batch_np)
    s_sp, m_sp = step(state_sh, db_nd, jnp.asarray(0.0))

    assert abs(float(m1["total"]) - float(m_sp["total"])) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s_sp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_actually_shards_gate_kernels():
    mesh = make_mesh_nd(factorize_mesh(8, "tp"))
    model, state0, step, batch_np = _setup(2)
    params = shard_params_tp(state0.params, mesh)
    shardings = {jax.tree_util.keystr(k): v.sharding
                 for k, v in jax.tree_util.tree_leaves_with_path(params)}
    sharded = [k for k, s in shardings.items() if not s.is_fully_replicated]
    assert sharded, "expected at least one tp-sharded kernel"
    for k in sharded:
        assert shardings[k].spec[-1] == "tp"


def test_sp_and_tp_together_is_refused():
    r"""sp x tp on one mesh hits an XLA partitioner miscompile (see
    parallel/mesh.py docstring); shard_params_tp must refuse it loudly
    rather than return silently-wrong numerics."""
    mesh = make_mesh_nd({"data": 2, "sp": 2, "tp": 2})
    model, state0, *_ = _setup(2)
    with pytest.raises(ValueError, match="miscompiles"):
        shard_params_tp(state0.params, mesh)


def test_xla_halo_tp_miscompile_is_still_present():
    r"""Pins the upstream XLA bug that motivates the sp x tp guard: a 3x3
    conv with input sharded over H ('sp') and kernel sharded over
    out-channels ('tp') returns wrong values under BOTH classic GSPMD and
    Shardy (jax 0.9.0, CPU backend; 1x1 kernels are exact). If this test
    FAILS, XLA fixed the bug — lift the guard in shard_params_tp and allow
    sp x tp meshes."""
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh_nd({"sp": 2, "tp": 2})
    rng = np.random.RandomState(0)
    x = rng.rand(4, 16, 16, 8).astype(np.float32)
    k = rng.rand(3, 3, 8, 16).astype(np.float32)

    def conv(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = jax.jit(conv)(x, k)
    out = jax.jit(conv)(
        jax.device_put(x, NamedSharding(mesh, P(None, "sp", None, None))),
        jax.device_put(k, NamedSharding(mesh, P(None, None, None, "tp"))))
    err = float(jnp.max(jnp.abs(ref - out)))
    assert err > 1.0, (
        f"XLA sp x tp conv now exact (max|err|={err}) — the partitioner bug "
        "is fixed; remove the sp x tp guard in parallel/mesh.py")


def test_fsdp_train_step_matches_single_device():
    r"""ZeRO-style param/opt-state sharding over the data axis must not
    change step semantics: XLA all-gathers weights at use sites and
    reduce-scatters their grads (SGD for the same reason as the tp test)."""
    from vp_suite_tpu.parallel.mesh import shard_params_fsdp
    mesh = make_mesh(8)
    model, state0, step, batch_np = _setup(8, opt="sgd")

    db1 = {k: jax.device_put(v) for k, v in batch_np.items()}
    s1, m1 = step(state0, db1, jnp.asarray(0.0))

    state_sh = state0.replace(
        params=shard_params_fsdp(state0.params, mesh, min_size=1024),
        opt_state=shard_params_fsdp(state0.opt_state, mesh, min_size=1024),
        extra_vars=shard_params(state0.extra_vars, mesh))
    db8 = {k: jax.device_put(v, batch_sharding(mesh)) for k, v in batch_np.items()}
    s8, m8 = step(state_sh, db8, jnp.asarray(0.0))

    assert abs(float(m1["total"]) - float(m8["total"])) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_fsdp_2d_sharding_matches_single_device():
    r"""Composed 2-D param sharding (out-channels over tp + one dim over
    data, ZeRO-style) on a data x tp mesh must not change step semantics,
    and big kernels must really live 1/(data*tp) per device."""
    from vp_suite_tpu.parallel.mesh import shard_params_tp_fsdp
    mesh = make_mesh_nd({"data": 4, "sp": 1, "tp": 2})
    model, state0, step, batch_np = _setup(4, opt="sgd")  # batch 8, data=4

    db1 = {k: jax.device_put(v) for k, v in batch_np.items()}
    s1, m1 = step(state0, db1, jnp.asarray(0.0))

    state_sh = state0.replace(
        params=shard_params_tp_fsdp(state0.params, mesh, min_size=1024),
        opt_state=shard_params_tp_fsdp(state0.opt_state, mesh, min_size=1024),
        extra_vars=shard_params(state0.extra_vars, mesh))
    db_nd = {"frames": jax.device_put(batch_np["frames"],
                                      video_batch_sharding(mesh)),
             "actions": jax.device_put(
                 batch_np["actions"],
                 jax.sharding.NamedSharding(
                     mesh, jax.sharding.PartitionSpec("data")))}
    s2, m2 = step(state_sh, db_nd, jnp.asarray(0.0))

    assert abs(float(m1["total"]) - float(m2["total"])) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    two_d = [v for v in jax.tree_util.tree_leaves(state_sh.params)
             if len([s for s in (v.sharding.spec or []) if s]) == 2]
    assert two_d, "expected at least one leaf sharded over BOTH axes"
    v = two_d[0]
    assert v.addressable_shards[0].data.size == v.size // 8


def test_fsdp_shards_large_leaves_only():
    from vp_suite_tpu.parallel.mesh import shard_params_fsdp
    mesh = make_mesh(8)
    model, state0, *_ = _setup(8)
    params = shard_params_fsdp(state0.params, mesh, min_size=1024)
    leaves = jax.tree_util.tree_leaves_with_path(params)
    sharded = [(k, v) for k, v in leaves if not v.sharding.is_fully_replicated]
    assert sharded, "expected large kernels sharded over the data axis"
    for k, v in leaves:
        if v.size < 1024:
            assert v.sharding.is_fully_replicated, jax.tree_util.keystr(k)
    # sharded leaves really hold 1/8th per device
    k, v = sharded[0]
    shard_size = v.addressable_shards[0].data.size
    assert shard_size == v.size // 8


def test_facade_fsdp_smoke():
    r"""VPSuite.train(fsdp=True) end to end on the 8-device CPU mesh."""
    from vp_suite_tpu import VPSuite
    suite = VPSuite(device="cpu")
    suite.load_dataset("MMF", img_size=16, digit_source="synthetic", n_seqs=16)
    suite.create_model("convlstm-shi")
    suite.train(batch_size=8, num_devices=8, fsdp=True, context_frames=2,
                pred_frames=2, epochs=1, steps_per_epoch=2, no_wandb=True,
                no_vis=True)


def test_batch_not_divisible_raises():
    from vp_suite_tpu import VPSuite
    suite = VPSuite(device="cpu")
    suite.load_dataset("MMF", img_size=16, digit_source="synthetic", n_seqs=16)
    suite.create_model("copy")
    with pytest.raises(ValueError, match="not divisible"):
        suite.train(batch_size=3, num_devices=8, context_frames=2, pred_frames=2,
                    epochs=1, no_wandb=True, no_vis=True)


def test_process_shard():
    from vp_suite_tpu.parallel.distributed import shard_dataset_for_process

    class FakeDS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return i

    ds = FakeDS()
    shards = [shard_dataset_for_process(ds, shard_id=s, num_shards=3) for s in range(3)]
    seen = sorted(x for sh in shards for x in (sh[i] for i in range(len(sh))))
    # uniform length keeps processes in lockstep (floor division drops the
    # remainder: 10 -> 3 shards of 3, item 9 dropped)
    assert len(set(len(sh) for sh in shards)) == 1
    assert len(seen) == len(set(seen)) == 9  # no overlap
    assert set(seen) <= set(range(10))


@pytest.mark.slow
@pytest.mark.parametrize("ckpt_backend", ["msgpack", "orbax"])
def test_multihost_two_process_train(tmp_path, ckpt_backend):
    r"""Real ``jax.distributed`` run: 2 spawned processes (1 CPU device each)
    train through the facade's multi-host path; parameters must end up
    identical on both processes (implicit psum gradient sync). msgpack:
    only process 0 writes the blob. orbax: BOTH processes participate in
    the sharded write and the artifact restores standalone."""
    import json
    import socket
    import subprocess
    import sys
    from pathlib import Path

    worker = Path(__file__).parent / "helpers" / "multihost_worker.py"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in __import__("os").environ.items()
           if not k.startswith(("XLA_", "JAX_"))}
    repo_root = Path(__file__).parent.parent
    env["PYTHONPATH"] = f"{repo_root}:{repo_root / 'tests'}"
    procs = [subprocess.Popen([sys.executable, str(worker), str(pid), str(port),
                               str(tmp_path), ckpt_backend],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = [json.loads((tmp_path / f"result_{i}.json").read_text())
               for i in range(2)]
    assert results[0]["process_count"] == results[1]["process_count"] == 2
    assert results[0]["steps"] == results[1]["steps"] > 0
    assert abs(results[0]["checksum"] - results[1]["checksum"]) < 1e-5
    # msgpack: written once by process 0; orbax: all processes write shards
    assert (tmp_path / "run" / "best_model").exists()
    if ckpt_backend == "orbax":
        ckpt = tmp_path / "run" / "best_model"
        assert (ckpt / "orbax_state").exists()
        # the sharded artifact restores standalone (single process, 8 devices)
        from vp_suite_tpu.checkpoint.orbax_backend import load_checkpoint_orbax
        model, state, model_id = load_checkpoint_orbax(ckpt)
        assert model_id == "convlstm-shi"
        leaves = jax.tree_util.tree_leaves(state.params)
        checksum = float(sum(np.abs(np.asarray(p)).sum() for p in leaves))
        assert abs(checksum - results[0]["checksum"]) < 1e-4


def test_train_set_smaller_than_batch_raises():
    r"""drop_last keeps one compiled step shape; a train set smaller than
    the batch would silently train ZERO steps — must error instead."""
    from vp_suite_tpu import VPSuite
    suite = VPSuite(device="cpu")
    suite.load_dataset("MMF", img_size=16, digit_source="synthetic", n_seqs=4)
    suite.create_model("copy")
    with pytest.raises(ValueError, match="no batch would ever be formed"):
        suite.train(batch_size=32, context_frames=2, pred_frames=2, epochs=1,
                    no_wandb=True, no_vis=True)
