r"""End-to-end ``VPSuite.train`` throughput on the north-star config.

Measures what a USER gets from ``suite.train()`` — not the isolated jitted
step: MMF Moving-MNIST, batch 32, 5 ctx -> 10 pred, 64x64, bf16 — with the
dataset's ``backend`` selectable:

    python scripts/train_e2e_device_bench.py device   # TPU-resident synthesis
    python scripts/train_e2e_device_bench.py numpy    # host loader (reference-style)

The 'trained N steps in X s' lines printed by the facade ARE the measurement
(wall clock around the full epoch loop, synced by a host fetch of the final
metrics). Epoch 1 includes compilation; epoch 2+ is the steady state.
"""
import sys
import time

import jax
import jax.numpy as jnp

from vp_suite_tpu import VPSuite


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "device"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    suite = VPSuite()
    suite.load_dataset("MMF", digit_source="synthetic", backend=backend,
                       n_seqs={"train": 9600, "val": 64, "test": 1000})
    suite.create_model("convlstm-shi", compute_dtype=jnp.bfloat16)
    t0 = time.time()
    suite.train(epochs=epochs, batch_size=32, context_frames=5, pred_frames=10,
                steps_per_epoch=steps, no_vis=True, no_wandb=True,
                vis_every=10**6)
    print(f"TOTAL wall: {time.time() - t0:.1f}s backend={backend}")


if __name__ == "__main__":
    main()
