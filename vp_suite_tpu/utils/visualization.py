r"""Visualization: GIF/MP4 sequence videos and multi-model comparison images.

Capability parity with ``vp_suite/utils/visualization.py:17-342``: colored
context(green)/prediction(red) borders, per-sequence GIF or MP4 export
(imageio replaces matplotlib-FuncAnimation/moviepy), side-by-side multi-model
comparison PNGs with a ``vis_info.txt`` manifest, and a debug histogram.

All inputs are uint8 [t, h, w, c] arrays (postprocessed, channels last).
"""
import os
from pathlib import Path

import numpy as np

COLORS = {"green": (40, 180, 40), "red": (210, 40, 40), "yellow": (210, 210, 40),
          "none": None}


def add_borders(trajs, context_frames: int, border: int = 2):
    r"""Adds green borders to context frames and red to predicted frames
    (parity: ``visualization.py:17-79``). Grayscale sequences are expanded
    to RGB first so the colored borders stay distinguishable, like the
    reference's colorization path."""
    trajs = np.asarray(trajs)
    t, h, w, c = trajs.shape
    if c < 3:
        trajs = np.repeat(trajs[..., :1], 3, axis=-1)
        c = 3
    out = np.zeros((t, h + 2 * border, w + 2 * border, c), dtype=np.uint8)
    for i in range(t):
        color = COLORS["green"] if i < context_frames else COLORS["red"]
        out[i, :, :] = np.asarray(color, dtype=np.uint8)[:c]
        out[i, border:-border, border:-border] = trajs[i]
    return out


def save_vid_vis(out_fp, context_frames, mode="gif", fps=4, **trajs):
    r"""Saves one or more named trajectories side by side as GIF or MP4
    (parity: ``visualization.py:82-143``).

    Args:
        out_fp: output file path (extension added by mode if missing).
        context_frames: frames drawn with the 'context' border color.
        trajs: named uint8 [t, h, w, c] sequences (e.g. GT=..., Pred=...).
    """
    import imageio.v2 as imageio
    seqs = [add_borders(v, context_frames) for v in trajs.values()]
    t = min(s.shape[0] for s in seqs)
    gap = 4
    h = max(s.shape[1] for s in seqs)
    frames = []
    for i in range(t):
        row = []
        for s in seqs:
            fr = s[i]
            if fr.shape[0] < h:
                pad = np.zeros((h - fr.shape[0], fr.shape[1], fr.shape[2]), np.uint8)
                fr = np.concatenate([fr, pad], axis=0)
            row.append(fr)
            row.append(np.zeros((h, gap, fr.shape[2]), np.uint8))
        frames.append(np.concatenate(row[:-1], axis=1))
    out_fp = str(out_fp)
    if mode == "mp4":
        if not out_fp.endswith(".mp4"):
            out_fp += ".mp4"
        try:
            imageio.mimsave(out_fp, frames, fps=fps)
        except Exception:
            out_fp = out_fp[:-4] + ".gif"
            imageio.mimsave(out_fp, frames, duration=1000.0 / fps, loop=0)
    else:
        if not out_fp.endswith(".gif"):
            out_fp += ".gif"
        imageio.mimsave(out_fp, frames, duration=1000.0 / fps, loop=0)
    return out_fp


def get_vis_from_model(dataset, data, predict_fn, context_frames):
    r"""Runs the model on one datapoint and returns postprocessed
    (input_vis, pred_vis) uint8 sequences (parity: ``visualization.py:146-184``)."""
    import jax.numpy as jnp
    batch = {"frames": jnp.asarray(data["frames"])[None],
             "actions": jnp.asarray(data["actions"])[None]}
    preds, _ = predict_fn(batch)
    input_vis = dataset.postprocess(np.asarray(data["frames"]))
    pred_frames = np.asarray(preds[0])
    pred_vis = dataset.postprocess(pred_frames)
    full_pred = np.concatenate([input_vis[:context_frames], pred_vis], axis=0)
    return input_vis, full_pred


def visualize_vid(dataset, context_frames, pred_frames, predict_fn, out_path,
                  vis_idx=None, n_vis=5, vis_mode="gif"):
    r"""Saves GT-vs-prediction videos for sampled datapoints
    (parity: ``visualization.py:187-217``)."""
    out_path = Path(out_path)
    out_path.mkdir(parents=True, exist_ok=True)
    n = len(dataset)
    if vis_idx is None:
        vis_idx = np.random.default_rng(0).choice(n, size=min(n_vis, n), replace=False)
    out_fps = []
    for i, idx in enumerate(vis_idx):
        data = dataset[int(idx)]
        gt_vis, pred_vis = get_vis_from_model(dataset, data, predict_fn, context_frames)
        out_fp = out_path / f"vis_{i}"
        out_fps.append(save_vid_vis(out_fp, context_frames, mode=vis_mode,
                                    GT=gt_vis[:context_frames + pred_frames],
                                    Pred=pred_vis))
    return out_fps


def save_frame_compare_img(out_fp, context_frames, ground_truth_vis, preds_vis,
                           vis_context_frame_idx=None):
    r"""Side-by-side multi-model comparison image
    (parity: ``visualization.py:220-267``)."""
    import imageio.v2 as imageio
    rows = []
    t = ground_truth_vis.shape[0]
    ctx_idx = list(vis_context_frame_idx) if vis_context_frame_idx is not None \
        else list(range(context_frames))
    gt_row = np.concatenate([ground_truth_vis[i] for i in range(t)], axis=1)
    rows.append(gt_row)
    for pred_vis in preds_vis:
        row = np.concatenate([pred_vis[i] for i in range(min(t, pred_vis.shape[0]))], axis=1)
        if row.shape[1] < gt_row.shape[1]:
            pad = np.zeros((row.shape[0], gt_row.shape[1] - row.shape[1], row.shape[2]),
                           np.uint8)
            row = np.concatenate([row, pad], axis=1)
        rows.append(row)
    img = np.concatenate(rows, axis=0)
    imageio.imwrite(str(out_fp), img)
    return out_fp


def visualize_sequences(dataset, context_frames, pred_frames, model_predict_fns,
                        out_path, n_vis=5, vis_mode="gif", vis_compare=False,
                        vis_context_frame_idx=None):
    r"""Per-model visualizations + optional comparison image + manifest
    (parity: ``visualization.py:270-322``)."""
    out_path = Path(out_path)
    out_path.mkdir(parents=True, exist_ok=True)
    n = len(dataset)
    rng = np.random.default_rng(0)
    vis_idx = rng.choice(n, size=min(n_vis, n), replace=False)
    info_lines = []
    for i, idx in enumerate(vis_idx):
        data = dataset[int(idx)]
        gt_vis = dataset.postprocess(np.asarray(data["frames"]))
        preds_vis = []
        for model_name, predict_fn in model_predict_fns.items():
            _, pred_vis = get_vis_from_model(dataset, data, predict_fn, context_frames)
            preds_vis.append(pred_vis)
            save_vid_vis(out_path / f"vis_{i}_{model_name}", context_frames,
                         mode=vis_mode, GT=gt_vis, Pred=pred_vis)
        if vis_compare:
            save_frame_compare_img(out_path / f"compare_{i}.png", context_frames,
                                   gt_vis, preds_vis, vis_context_frame_idx)
        info_lines.append(f"vis_{i}: dataset idx {idx}, origin: {data.get('origin', '?')}")
    with open(out_path / "vis_info.txt", "w") as f:
        f.write("\n".join(info_lines) + "\n")


def save_arr_hist(arr, out_fp="debug_hist.png"):
    r"""Debug histogram of array values (parity: ``visualization.py:325-342``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    arr = np.asarray(arr)
    fig, ax = plt.subplots()
    ax.hist(arr.ravel(), bins=100)
    ax.set_title(f"min={arr.min():.4f} max={arr.max():.4f} mean={arr.mean():.4f}")
    fig.savefig(out_fp)
    plt.close(fig)
