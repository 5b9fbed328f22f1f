r"""Device mesh + sharding helpers (data parallelism).

The reference is strictly single-device (``vp_suite/vpsuite.py:39-46``; no
torch.distributed anywhere — SURVEY.md §2.9). This module provides the
TPU-native scaling layer the reference lacks:

- a 1-D ``Mesh`` over local devices with a ``data`` axis,
- parameters replicated (``P()``), batches sharded along the batch dim
  (``P('data')``),
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
