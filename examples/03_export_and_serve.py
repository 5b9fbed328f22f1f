r"""Deployment: AOT-export the trained predictor to one portable StableHLO
artifact, then serve it with jax alone (no vp_suite_tpu, no checkpoint, no
model class needed on the serving host).

    python examples/03_export_and_serve.py
"""
import numpy as np

from vp_suite_tpu import VPSuite
from vp_suite_tpu.serving import load_predictor

CTX, PRED, IMG = 4, 4, 32


def main():
    # -- training side ---------------------------------------------------
    suite = VPSuite()
    suite.load_dataset("MMF", img_size=IMG, digit_source="auto", n_seqs=32)
    suite.create_model("convlstm-shi")
    suite.train(epochs=1, batch_size=8, context_frames=CTX, pred_frames=PRED,
                steps_per_epoch=4, no_wandb=True, no_vis=True)
    artifact = suite.export_model("/tmp/predictor.stablehlo",
                                  context_frames=CTX, pred_frames=PRED,
                                  batch_size=1)
    print(f"exported {artifact} ({artifact.stat().st_size} bytes)")

    # -- serving side (only jax needed from here on) ---------------------
    predict = load_predictor(artifact)
    frames = np.random.rand(1, CTX, IMG, IMG, 3).astype(np.float32)
    preds = predict(frames)
    print("served prediction:", preds.shape, preds.dtype)

    # or skip the artifact and predict directly through the facade:
    print("facade prediction:", suite.predict(frames[0], pred_frames=PRED).shape)


if __name__ == "__main__":
    main()
