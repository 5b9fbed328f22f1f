r"""Device mesh + sharding helpers (data / spatial / tensor parallelism).

The reference is strictly single-device (``vp_suite/vpsuite.py:39-46``; no
torch.distributed anywhere — SURVEY.md §2.9). This module provides the
TPU-native scaling layer the reference lacks:

- a 1-D ``Mesh`` over local devices with a ``data`` axis (default), or an
  N-D mesh with ``data`` x ``sp`` (spatial) x ``tp`` (tensor) axes,
- parameters replicated (``P()``) or out-channel-sharded over ``tp``,
- batches sharded along the batch dim (``P('data')``) and optionally the
  image-height dim (``P(..., 'sp')``) — XLA's SPMD partitioner inserts the
  conv halo exchanges for spatially-sharded convolutions itself,

.. warning:: XLA's SPMD partitioner (classic GSPMD *and* Shardy, jax 0.9.0)
  has TWO correctness bugs around spatial sharding, so ``sp`` is
  **inference-only** here:

  1. A >1x1 conv with spatially-sharded input AND out-channel-sharded kernel
     (sp x tp) miscompiles in the FORWARD pass — silent wrong values of
     output magnitude via the halo-exchange path (1x1 kernels exact; output
     sharding constraints don't help). Pinned by ``tests/test_parallel.py::
     test_xla_halo_tp_miscompile_is_still_present``; ``shard_params_tp``
     refuses sp x tp meshes.
  2. With a spatially-sharded batch and REPLICATED params, the forward pass
     is exact but the BACKWARD doubles (factor = sp size) the d_kernel of
     most convs in the EF-ConvLSTM graph — XLA all-gathers the activations
     for the kernel-grad conv, then still all-reduces the "partial" result
     over sp. Small repros (lone stride-2 conv, conv-in-remat-scan,
     conv_transpose) do NOT trigger it; the full model does. Pinned by
     ``test_xla_sp_dkernel_doubling_is_still_present``; ``check_train_mesh``
     refuses sp>1 for training.

  Training meshes: data x tp (both proven bit-exact vs single device).
  Inference/eval meshes: data x sp (forward proven exact; halo exchanges
  over ICI). If the pinning tests start FAILING, XLA fixed the bugs — lift
  the corresponding guard.
- gradients all-reduced over ICI automatically: under ``jit``, the loss of a
  batch-sharded input w.r.t. replicated params lowers to an XLA ``psum``
  collective — no hand-written NCCL-style code.

Multi-host extension: call ``jax.distributed.initialize`` before building the
mesh and shard file/index ranges per process; the sharding annotations below
are unchanged (XLA routes intra-slice traffic over ICI, inter-slice over DCN).
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count(platform=None):
    return len(jax.devices(platform) if platform else jax.devices())


def make_mesh(num_devices: int = 0, axis_name: str = "data", devices=None):
    r"""Builds a 1-D data-parallel mesh over ``num_devices`` local devices
    (0 = all)."""
    devices = devices if devices is not None else jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data"):
    r"""Shards the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def shard_params(params, mesh: Mesh):
    r"""Replicates a parameter pytree onto every device of the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(params, sharding)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    r"""Moves a host batch dict to device, sharded along the batch dim."""
    sharding = batch_sharding(mesh, axis_name)
    return {k: (jax.device_put(v, sharding) if hasattr(v, "ndim") else v)
            for k, v in batch.items()}


# ---------------------------------------------------------------------------
# N-D meshes: data x spatial x tensor parallelism
# ---------------------------------------------------------------------------

def make_mesh_nd(axis_sizes: dict, devices=None) -> Mesh:
    r"""Builds an N-D mesh from an ordered ``{axis_name: size}`` dict, e.g.
    ``{"data": 2, "sp": 2, "tp": 2}``. Axes of size 1 are kept (they cost
    nothing and keep PartitionSpecs uniform)."""
    devices = list(devices if devices is not None else jax.devices())
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_sizes.keys()))


def factorize_mesh(n_devices: int, strategy: str = "tp") -> dict:
    r"""Splits ``n_devices`` into data x sp x tp axis sizes: peel a factor of
    2 for the model-parallel axis named by ``strategy`` (``"tp"`` =
    Megatron-style out-channel, safe for training; ``"sp"`` = spatial,
    inference-only — see module docstring), the rest is ``data``. Prime
    counts degrade to pure data parallelism. ``sp`` and ``tp`` are never
    both >1 — XLA miscompiles that combination (see module docstring)."""
    assert strategy in ("sp", "tp"), strategy
    mp = 2 if n_devices % 2 == 0 else 1
    axes = {"data": n_devices // mp, "sp": 1, "tp": 1}
    axes[strategy] = mp
    return axes


def check_train_mesh(mesh: Mesh):
    r"""Refuses meshes that are unsafe for TRAINING: an active spatial axis
    makes XLA double-count conv kernel gradients (factor = sp size) on this
    XLA version — silent corruption, see module docstring. Spatial meshes
    remain fine for inference/eval (forward pass proven exact).

    Exception: inside a :func:`vp_suite_tpu.parallel.spatial.
    spatial_halo_convs` context the convs lower to explicit halo-exchange
    ``shard_map`` regions that XLA never partitions — the bug is sidestepped
    and sp TRAINING is allowed (step-equivalence pinned in
    ``tests/test_spatial.py``).

    Note: the INTERLEAVED EF graph (the auto-default since round 5) happens
    not to trigger the doubling either — sp train == single-device at 1e-5
    (``tests/test_parallel.py::test_sp_train_exact_on_interleaved_default``).
    The guard still refuses generic sp training because it cannot see which
    graph will be traced; use ``spatial_halo_convs`` for the sanctioned
    path."""
    sp = mesh.shape.get("sp", 1) if "sp" in mesh.axis_names else 1
    if sp > 1:
        from vp_suite_tpu.parallel.spatial import active_spatial
        if active_spatial() is not None:
            return
        raise ValueError(
            f"mesh with active spatial axis (sp={sp}) is inference-only: "
            "XLA's SPMD partitioner doubles conv d_kernel under spatial "
            "sharding (silent wrong gradients; see parallel/mesh.py "
            "docstring). Train on a data x tp mesh "
            "(factorize_mesh(n, strategy='tp')), or wrap tracing in "
            "parallel.spatial.spatial_halo_convs(mesh) to train with "
            "explicit halo-exchange convs.")


def video_batch_sharding(mesh: Mesh):
    r"""Sharding for a ``[b, t, h, w, c]`` video batch: batch over ``data``,
    image height over ``sp`` (if present). XLA SPMD spatially partitions the
    convolutions, inserting halo exchanges over the ``sp`` axis."""
    names = mesh.axis_names
    spec = [None] * 5
    if "data" in names:
        spec[0] = "data"
    if "sp" in names:
        spec[2] = "sp"
    return NamedSharding(mesh, P(*spec))


def shard_params_tp(params, mesh: Mesh, min_channels: int = 0):
    r"""Megatron-style out-channel sharding: every conv/dense kernel and bias
    whose LAST dim is divisible by the ``tp`` axis size (and >= min_channels)
    is sharded over ``tp``; everything else is replicated. XLA's SPMD
    partitioner reshards at layer boundaries where neighbours disagree
    (all-gathers over ICI), so this is semantics-preserving for any rule —
    EXCEPT combined with spatial sharding, which XLA miscompiles (module
    docstring); such meshes are rejected."""
    names = mesh.axis_names
    tp = mesh.shape.get("tp", 1) if "tp" in names else 1
    sp = mesh.shape.get("sp", 1) if "sp" in names else 1
    if tp > 1 and sp > 1:
        raise ValueError(
            "refusing to tensor-shard params on a mesh with an active spatial "
            f"axis (sp={sp}, tp={tp}): XLA's SPMD partitioner miscompiles "
            ">1x1 convs with spatially-sharded inputs and channel-sharded "
            "kernels (silent wrong values; see parallel/mesh.py docstring). "
            "Train on factorize_mesh(n, strategy='tp'); spatial meshes are "
            "inference-only.")

    def place(x):
        if tp > 1 and hasattr(x, "ndim") and x.ndim >= 1 \
                and x.shape[-1] % tp == 0 and x.shape[-1] >= max(tp, min_channels):
            spec = [None] * (x.ndim - 1) + ["tp"]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, params)


def shard_params_tp_fsdp(params, mesh: Mesh, min_size: int = 4096):
    r"""Composed 2-D parameter sharding on a data x tp mesh: the LAST dim
    (out-channels) over ``tp`` (Megatron) AND, for large leaves, one other
    dim over ``data`` (ZeRO) — per-device param/optimizer HBM drops
    ~(data*tp) x. XLA all-gathers both axes at use sites and
    reduce-scatters grads. Spatial-sharding-free, so none of the XLA
    miscompiles above apply; proven step-equivalent in
    ``tests/test_parallel.py``."""
    names = mesh.axis_names
    tp = mesh.shape.get("tp", 1) if "tp" in names else 1
    sp = mesh.shape.get("sp", 1) if "sp" in names else 1
    if tp > 1 and sp > 1:
        raise ValueError("sp x tp is refused (see module docstring)")
    data = mesh.shape.get("data", 1) if "data" in names else 1

    def place(x):
        if not (hasattr(x, "ndim") and x.ndim >= 1):
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = [None] * x.ndim
        if tp > 1 and x.shape[-1] % tp == 0 and x.shape[-1] >= tp:
            spec[-1] = "tp"
        if data > 1 and x.size >= min_size:
            for d in reversed(range(x.ndim)):
                if spec[d] is None and x.shape[d] % data == 0:
                    spec[d] = "data"
                    break
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(place, params)


def shard_params_fsdp(params, mesh: Mesh, axis: str = "data",
                      min_size: int = 4096):
    r"""ZeRO-style sharding of params / optimizer state over the DATA axis:
    each leaf with >= ``min_size`` elements is sharded along its last
    ``axis``-divisible dim; small leaves stay replicated (sharding them buys
    no memory and adds collectives). Under ``jit``, XLA all-gathers a
    sharded param right before its (replicated-layout) use and
    reduce-scatters its gradient back — ZeRO-3 semantics from annotations
    alone, no hand-written comm. Per-device HBM for params+optimizer drops
    ~``axis_size`` x, which is what lets the b32 flagship config keep Adam
    state for much larger models on one v5e core's 16 GB.

    Unlike spatial sharding this keeps every conv's operands in safe
    layouts (the compute itself runs on gathered, replicated-layout
    weights), so it composes with the sp/tp guards above."""
    n = mesh.shape.get(axis, 1) if axis in mesh.axis_names else 1

    def place(x):
        if n > 1 and hasattr(x, "ndim") and x.ndim >= 1 and x.size >= min_size:
            for d in reversed(range(x.ndim)):
                if x.shape[d] % n == 0:
                    spec = [None] * x.ndim
                    spec[d] = axis
                    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, params)
