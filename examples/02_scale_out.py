r"""Scaling knobs: data parallelism, ZeRO-style FSDP, gradient accumulation,
orbax sharded checkpoints — all from the facade, all pure sharding
annotations underneath (XLA inserts the collectives over ICI).

Without real multi-chip hardware, exercise the same code on virtual CPU
devices:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/02_scale_out.py
"""
import jax


def main():
    if len(jax.devices()) < 2:
        print("NOTE: only 1 device visible - set XLA_FLAGS as in the "
              "docstring to simulate 8 CPU devices")
    from vp_suite_tpu import VPSuite
    suite = VPSuite()
    suite.load_dataset("MMF", img_size=16, digit_source="auto", n_seqs=64)
    suite.create_model("convlstm-shi")
    suite.train(
        epochs=1, batch_size=16, context_frames=2, pred_frames=2,
        steps_per_epoch=2, no_wandb=True, no_vis=True,
        num_devices=0,          # 0 = all visible devices, batch sharded
        fsdp=True,              # params + Adam state sharded over data axis
        accum_steps=2,          # 2 microbatches per optimizer step
        ckpt_backend="orbax",   # each process writes its own shards
    )
    print("per-epoch end-to-end frames/s:", suite.models[-1].train_epoch_fps)


if __name__ == "__main__":
    main()
