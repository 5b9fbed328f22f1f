r"""Worker for the 2-process ``jax.distributed`` integration test.

Launched twice by ``tests/test_parallel.py::test_multihost_two_process_train``
(one subprocess per simulated host, 1 CPU device each). Runs a tiny facade
training through the multi-host path (per-process dataset shard, global batch
assembly via ``jax.make_array_from_process_local_data``, implicit psum over
the 2-device global mesh) and dumps a parameter checksum so the parent can
assert both processes ended with identical (synced) parameters.

Usage: python multihost_worker.py <process_id> <coordinator_port> <out_dir>
       [ckpt_backend]
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
# both simulated hosts live on this machine: route Gloo (the CPU collective
# backend) over loopback, not the default interface
os.environ.setdefault("GLOO_SOCKET_IFNAME", "lo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    ckpt_backend = sys.argv[4] if len(sys.argv) > 4 else "msgpack"
    from vp_suite_tpu.parallel.distributed import initialize_multihost
    initialize_multihost(coordinator_address=f"localhost:{port}",
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()

    from vp_suite_tpu import VPSuite
    suite = VPSuite(device="cpu")
    suite.load_dataset("MMF", img_size=16, digit_source="synthetic", n_seqs=8)
    suite.create_model("convlstm-shi")
    suite.train(out_dir=os.path.join(out_dir, "run"), epochs=1, batch_size=4,
                context_frames=2, pred_frames=2, steps_per_epoch=2,
                no_wandb=True, no_vis=True, metrics=["mse"],
                ckpt_backend=ckpt_backend)

    import numpy as np
    params = suite.models[0].state.params
    leaves = jax.tree_util.tree_leaves(params)
    checksum = float(sum(np.abs(np.asarray(p)).sum() for p in leaves))
    n_steps = int(suite.models[0].state.step)
    with open(os.path.join(out_dir, f"result_{pid}.json"), "w") as f:
        json.dump({"checksum": checksum, "steps": n_steps,
                   "process_count": jax.process_count()}, f)


if __name__ == "__main__":
    main()
