r"""Physics 101 dataset.

Capability parity with ``vp_suite/datasets/physics101.py:12-96``: raw mp4s
globbed per camera, seeded trainval/test shuffle-split, start/middle/end
subsequence extraction.
"""
import os
from pathlib import Path

import numpy as np

from vp_suite_tpu.base.base_dataset import VPDataset, VPData
from vp_suite_tpu.defaults import SETTINGS
from vp_suite_tpu.utils.utils import set_from_kwarg, seeded_shuffle_split, read_video


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

        set_from_kwarg(self, dataset_kwargs, "camera", choices=self.AVAILABLE_CAMERAS)
        set_from_kwarg(self, dataset_kwargs, "subseq", choices=self.AVAILABLE_SUBSEQ)
        set_from_kwarg(self, dataset_kwargs, "trainval_test_seed")

        all_vids = sorted(Path(self.data_dir).rglob(f"**/{self.camera}.mp4"))
        if not all_vids:
            raise FileNotFoundError(f"no {self.camera}.mp4 files under {self.data_dir}")
        trainval, test = seeded_shuffle_split(all_vids, self.trainval_to_test_ratio,
                                              self.trainval_test_seed)
        self.vid_filepaths = trainval if self.split == "train" else test

    def __getitem__(self, i) -> VPData:
        vid_fp = self.vid_filepaths[i]
        vid = read_video(vid_fp, num_frames=self.total_frames)  # [T, h, w, c]
        if self.seq_step > 1:
            vid = vid[::self.seq_step]
        if self.subseq == "start":
            vid = vid[:self.total_frames]
        elif self.subseq == "end":
            vid = vid[-self.total_frames:]
        elif self.subseq == "middle":
            frame_offset = (vid.shape[0] - self.total_frames) // 2
            vid = vid[frame_offset:frame_offset + self.total_frames]
        vid = self.preprocess(vid)
        actions = np.zeros((self.total_frames, 1), dtype=np.float32)
        return {"frames": vid, "actions": actions,
                "origin": f"{vid_fp}, subseq mode: {self.subseq}"}

    def __len__(self):
        return len(self.vid_filepaths)

    def download_and_prepare_dataset(self):
        d_path = self.DEFAULT_DATA_DIR
        d_path.mkdir(parents=True, exist_ok=True)
        if len(list(d_path.rglob("**/*.mp4"))) == 0:
            tar_fname = "phys101_v1.0.tar"
            tar_path = d_path / tar_fname
            if not tar_path.exists():
                from vp_suite_tpu.utils.utils import download_from_url
                download_from_url(f"http://phys101.csail.mit.edu/data/{tar_fname}", tar_path)
            print("Extracting data...")
            import tarfile
            with tarfile.open(tar_path) as tar:
                tar.extractall(d_path)
            os.remove(tar_path)
