r"""Physics 101 dataset.

Capability parity with ``vp_suite/datasets/physics101.py:12-96``: one clip
per experiment video (no windowing — each mp4 IS the item), camera selection
by filename, a seeded trainval/test shuffle-split, and start/middle/end
subsequence extraction applied AFTER temporal striding (reference order,
``physics101.py:57-67``).

Split semantics are the reference's; the shared machinery lives in
:mod:`vp_suite_tpu.datasets._indexing`.
"""
from pathlib import Path

from vp_suite_tpu.base.base_dataset import VPDataset, VPData
from vp_suite_tpu.datasets import _indexing as idx
from vp_suite_tpu.defaults import SETTINGS
from vp_suite_tpu.utils.utils import set_from_kwarg, read_video


def _subseq_crop(frames, mode, n):
    r"""Crops ``n`` frames from the start / middle / end of a clip."""
    if mode == "end":
        return frames[-n:]
    off = (frames.shape[0] - n) // 2 if mode == "middle" else 0
    return frames[off:off + n]


class Physics101Dataset(VPDataset):
    NAME = "Physics 101"
    REFERENCE = "http://phys101.csail.mit.edu/"
    IS_DOWNLOADABLE = "Yes"
    DEFAULT_DATA_DIR = SETTINGS.DATA_PATH / "phys101"
    AVAILABLE_CAMERAS = ["Camera_1", "Camera_2", "Kinect_RGB_1"]
    AVAILABLE_SUBSEQ = ["start", "middle", "end"]
    MIN_SEQ_LEN = 16
    ACTION_SIZE = 0
    DATASET_FRAME_SHAPE = (1080, 1920, 3)

    camera = "Kinect_RGB_1"
    subseq = "middle"
    trainval_to_test_ratio = 0.8
    trainval_test_seed = 1612  # value from the 'Noether Networks' code (reference :34)

    def __init__(self, split, **dataset_kwargs):
        super().__init__(split, **dataset_kwargs)
        self.NON_CONFIG_VARS.extend(["vid_filepaths"])
        for attr, choices in [("camera", self.AVAILABLE_CAMERAS),
                              ("subseq", self.AVAILABLE_SUBSEQ),
                              ("trainval_test_seed", None)]:
            set_from_kwarg(self, dataset_kwargs, attr, choices=choices)

        found = sorted(Path(self.data_dir).rglob(f"**/{self.camera}.mp4"))
        if not found:
            raise FileNotFoundError(f"no {self.camera}.mp4 files under {self.data_dir}")
        # 'train' here means the whole trainval pool (reference :45-50: the
        # cut is trainval vs test, not train vs val)
        pick = "train" if self.split == "train" else "val"
        self.vid_filepaths = idx.split_members(found, pick,
                                               self.trainval_to_test_ratio,
                                               self.trainval_test_seed)

    def __len__(self):
        return len(self.vid_filepaths)

    def __getitem__(self, i) -> VPData:
        fp = self.vid_filepaths[i]
        clip = read_video(fp, num_frames=self.total_frames)
        if self.seq_step > 1:
            clip = clip[::self.seq_step]
        clip = _subseq_crop(clip, self.subseq, self.total_frames)
        return idx.actionless_item(self, clip,
                                   origin=f"{fp}, subseq mode: {self.subseq}")

    def download_and_prepare_dataset(self):
        root = self.DEFAULT_DATA_DIR
        root.mkdir(parents=True, exist_ok=True)
        if any(root.rglob("**/*.mp4")):
            return  # already extracted
        idx.fetch_and_extract_tar(root, "phys101_v1.0.tar",
                                  "http://phys101.csail.mit.edu/data/")
