r"""Sequence parallelism: shard the TIME axis of a recurrence over a mesh.

MinConvRNN's hidden recurrence is element-wise LINEAR (input-dependent
gates), hence associative — so the context window itself can shard over a
device mesh: each device scans its time block, per-block aggregates exchange
in ONE all_gather, and an exclusive prefix-combine stitches the blocks
(``vp_suite_tpu/ops/scan_parallel.py``). The result is EXACT, not an
approximation. No reference model can express this axis (strictly
sequential time loops).

Runs on 8 virtual CPU devices; on real hardware, build the mesh from TPU
devices instead.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/04_sequence_parallel.py
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402


def main():
    import jax
    # this demo runs on the virtual CPU mesh; querying the backend first
    # would initialize (and potentially hang on) a remote TPU plugin. On
    # real hardware drop this line and build the mesh from jax.devices().
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from vp_suite_tpu.models import MODEL_CLASSES
    from vp_suite_tpu.parallel.mesh import make_mesh_nd

    mesh = make_mesh_nd({"seq": 8})
    print(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} devices")

    kwargs = dict(img_shape=(3, 16, 16), action_size=0,
                  tensor_value_range=(0.0, 1.0), hidden_dim=32)
    serial = MODEL_CLASSES["min-conv-rnn"](**kwargs)
    parallel = MODEL_CLASSES["min-conv-rnn"](**kwargs, context_mesh=mesh)

    # a context window of 16 frames, 2 per device (scale this up on real
    # hardware — the point is that T shards)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 16, 3),
                    jnp.float32)
    variables = serial.init({"params": jax.random.PRNGKey(0)}, x,
                            pred_frames=2)

    ref, _ = serial.apply(variables, x, pred_frames=2)
    out, _ = jax.jit(lambda v, x: parallel.apply(v, x, pred_frames=2))(
        variables, x)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"context window 16 frames sharded 8-way over 'seq'; "
          f"max |Δ| vs single-device scan: {err:.2e}")
    assert err < 1e-4
    print("sequence-parallel encoding is exact.")


if __name__ == "__main__":
    main()
