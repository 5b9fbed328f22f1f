r"""Shared clip-indexing machinery for the file-backed video datasets.

The file-backed loaders all answer the same three questions, each previously
answered inline per loader:

1. *Which videos belong to my split?* — deterministic membership from a
   seeded shuffle + ratio cut (semantics of
   :func:`vp_suite_tpu.utils.utils.seeded_shuffle_split`, the convention the
   reference suite uses across its path-globbing datasets, e.g.
   ``vp_suite/datasets/caltech_pedestrian.py:49-59``,
   ``human36m.py:53-60``, ``kitti_raw.py:52-63``).
2. *How long is each video?* — a prepare-time ``frame_counts.json`` sidecar
   (cv2 frame counts are unreliable for some containers, so counts are
   established once by decoding; reference workaround:
   ``caltech_pedestrian.py:97-116``).
3. *Which (video, start-frame) windows exist at the negotiated sequence
   length?* — non-overlapping clip windows that advance by
   ``seq_len + seq_step - 1`` raw frames (reference convention:
   ``caltech_pedestrian.py:62-66``, ``human36m.py:65-69``).

Centralizing them keeps each loader down to its genuinely dataset-specific
logic (set filters, scenario names, subsequence modes).
"""
import json
from pathlib import Path

import numpy as np


def load_frame_counts(metadata_dir) -> dict:
    r"""Reads the prepare-time ``frame_counts.json`` sidecar: a mapping of
    absolute video path -> decoded frame count."""
    with open(Path(metadata_dir) / "frame_counts.json", "r") as f:
        return json.load(f)


def write_frame_counts(metadata_dir, video_paths) -> dict:
    r"""Decodes each video once and writes the ``frame_counts.json`` sidecar
    (prepare-time; see module doc, question 2)."""
    from vp_suite_tpu.utils.utils import get_frame_count
    counts = {str(Path(fp).resolve()): get_frame_count(fp)
              for fp in video_paths}
    with open(Path(metadata_dir) / "frame_counts.json", "w") as f:
        json.dump(counts, f)
    return counts


def split_members(pool, split, ratio, seed, at_least_one=False):
    r"""Deterministic train/val membership: seeded shuffle, cut at
    ``int(len * ratio)`` (optionally floored at 1); ``train`` takes the head,
    ``val`` the tail. Test splits never come through here — they are
    dataset-defined (held-out sets/folders), not ratio cuts."""
    from vp_suite_tpu.utils.utils import seeded_shuffle_split
    head, tail = seeded_shuffle_split(pool, ratio, seed, at_least_one)
    return head if split == "train" else tail


def window_starts(n_frames, seq_len, seq_step, skip_first=0):
    r"""Start indices of the non-overlapping clip windows inside one video:
    each window spans ``seq_len`` raw frames (before striding) and the next
    begins ``seq_len + seq_step - 1`` frames later."""
    return range(skip_first, n_frames - seq_len + 1, seq_len + seq_step - 1)


def build_window_index(counted_videos, seq_len, seq_step, skip_first=0):
    r"""Flattens ``(path, frame_count)`` pairs into the loader's item index:
    one ``(path, start_frame)`` entry per clip window."""
    return [(fp, s) for fp, n in counted_videos
            for s in window_starts(n, seq_len, seq_step, skip_first)]


def read_strided_clip(fp, start, seq_len, seq_step, img_size=None):
    r"""Decodes one clip window: ``seq_len`` raw frames from ``start``,
    temporally strided to the model-facing frame count."""
    from vp_suite_tpu.utils.utils import read_video
    frames = read_video(fp, img_size=img_size, start_index=start,
                        num_frames=seq_len)
    return frames[::seq_step]


def fetch_and_extract_tar(root, tar_fname, base_url):
    r"""Prepare-time helper: download ``base_url + tar_fname`` into ``root``
    (skipped when the tarball is already present), extract it there, and
    remove the archive."""
    import os
    import tarfile
    tar_path = Path(root) / tar_fname
    if not tar_path.exists():
        from vp_suite_tpu.utils.utils import download_from_url
        download_from_url(base_url + tar_fname, tar_path)
    print("Extracting data...")
    with tarfile.open(tar_path) as tar:
        tar.extractall(root)
    os.remove(tar_path)


def actionless_item(dataset, clip, origin, transform=True):
    r"""Packs a decoded clip into the :class:`VPData` dict for datasets
    without real actions (zero action vectors, reference convention)."""
    frames = dataset.preprocess(clip, transform=transform)
    actions = np.zeros((dataset.total_frames, 1), dtype=np.float32)
    return {"frames": frames, "actions": actions, "origin": origin}
