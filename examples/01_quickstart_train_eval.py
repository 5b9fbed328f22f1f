r"""Quickstart: train EF-ConvLSTM on on-the-fly Moving MNIST and evaluate.

Runs anywhere (CPU or TPU; auto-detected). Small shapes so it finishes in
about a minute on a laptop CPU — scale img_size/batch_size/epochs up on real
hardware (the TPU v5e numbers in STATUS.md use img_size=64, batch_size=32).

    python examples/01_quickstart_train_eval.py
"""
from vp_suite_tpu import VPSuite


def main():
    suite = VPSuite()  # device="auto": TPU if present, else CPU
    suite.load_dataset("MMF", img_size=32, digit_source="auto", n_seqs=64)
    suite.create_model("convlstm-shi")
    suite.train(epochs=2, batch_size=8, context_frames=4, pred_frames=4,
                steps_per_epoch=4, no_wandb=True, no_vis=True)

    suite.load_dataset("MMF", split="test", img_size=32, digit_source="auto",
                       n_seqs=16)
    results = suite.test(brief_test=True, context_frames=4, pred_frames=4,
                         no_wandb=True, no_vis=True)
    print("test metrics:", results)


if __name__ == "__main__":
    main()
