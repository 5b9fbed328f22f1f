r"""KITTI raw dataset.

Capability parity with ``vp_suite/datasets/kitti_raw.py:13-113``: PNG directory
tree per drive & camera, two-level seeded split (trainval/test then train/val),
non-overlapping window indexing.
"""
import random
from pathlib import Path

import numpy as np

from vp_suite_tpu.base.base_dataset import VPDataset, VPData
from vp_suite_tpu.defaults import SETTINGS
from vp_suite_tpu.utils.utils import set_from_kwarg


class KITTIRawDataset(VPDataset):
    NAME = "KITTI raw"
    REFERENCE = "http://www.cvlibs.net/datasets/kitti/raw_data.php"
    IS_DOWNLOADABLE = "With Registered Account"
    DEFAULT_DATA_DIR = SETTINGS.DATA_PATH / "kitti_raw"
    VALID_SPLITS = ["train", "val", "test"]
    MIN_SEQ_LEN = 994
    ACTION_SIZE = 0
    DATASET_FRAME_SHAPE = (375, 1242, 3)
    FPS = 10
    AVAILABLE_CAMERAS = [f"image_{i:02d}" for i in range(4)]

    camera = "image_02"
    trainval_to_test_ratio = 0.8
    train_to_val_ratio = 0.9
    trainval_test_seed = 1234

    def __init__(self, split, **dataset_kwargs):
        super().__init__(split, **dataset_kwargs)
        self.NON_CONFIG_VARS.extend(["sequences", "sequences_with_frame_index",
                                     "AVAILABLE_CAMERAS"])

        set_from_kwarg(self, dataset_kwargs, "camera")
        set_from_kwarg(self, dataset_kwargs, "trainval_to_test_ratio")
        set_from_kwarg(self, dataset_kwargs, "train_to_val_ratio")
        set_from_kwarg(self, dataset_kwargs, "trainval_test_seed")
        set_from_kwarg(self, dataset_kwargs, "train_val_seed")

        dd = Path(self.data_dir)
        sequence_dirs = [sub for d in dd.iterdir() for sub in d.iterdir()
                         if dd.is_dir() and sub.is_dir()]
        if len(sequence_dirs) < 3:
            raise ValueError(f"Dataset {self.NAME}: found less than 3 sequences "
                             f"-> can't split dataset -> can't use it")

        slice_idx = max(1, int(len(sequence_dirs) * self.trainval_to_test_ratio))
        random.Random(self.trainval_test_seed).shuffle(sequence_dirs)
        if self.split == "test":
            sequence_dirs = sequence_dirs[slice_idx:]
        else:
            sequence_dirs = sequence_dirs[:slice_idx]
            slice_idx = max(1, int(len(sequence_dirs) * self.train_to_val_ratio))
            random.Random(self.train_val_seed).shuffle(sequence_dirs)
            if self.split == "train":
                sequence_dirs = sequence_dirs[:slice_idx]
            else:
                sequence_dirs = sequence_dirs[slice_idx:]

        self.sequences = []
        for sequence_dir in sorted(sequence_dirs):
            sequence_len = len(list(sequence_dir.rglob(f"{self.camera}/data/*.png")))
            self.sequences.append((sequence_dir, sequence_len))

        self.sequences_with_frame_index = []

    def _set_seq_len(self):
        for sequence_path, frame_count in self.sequences:
            valid_start_idx = range(0, frame_count - self.seq_len + 1,
                                    self.seq_len + self.seq_step - 1)
            for idx in valid_start_idx:
                self.sequences_with_frame_index.append((sequence_path, idx))

    def __getitem__(self, i) -> VPData:
        import cv2
        sequence_path, start_idx = self.sequences_with_frame_index[i]
        all_img_paths = sorted(sequence_path.rglob(f"{self.camera}/data/*.png"))
        seq_img_paths = all_img_paths[start_idx:start_idx + self.seq_len:self.seq_step]
        seq_imgs = [cv2.cvtColor(cv2.imread(str(fp.resolve())), cv2.COLOR_BGR2RGB)
                    for fp in seq_img_paths]
        vid = self.preprocess(np.stack(seq_imgs, axis=0))
        actions = np.zeros((self.total_frames, 1), dtype=np.float32)
        return {"frames": vid, "actions": actions,
                "origin": f"{sequence_path}, start frame: {start_idx}"}

    def __len__(self):
        return len(self.sequences_with_frame_index)

    @classmethod
    def download_and_prepare_dataset(cls):
        d_path = cls.DEFAULT_DATA_DIR
        d_path.mkdir(parents=True, exist_ok=True)
        try:
            _ = next(d_path.rglob("**/*.png"))
            print(f"Found image data in {str(d_path.resolve())} -> Won't download {cls.NAME}")
        except StopIteration:
            from vp_suite_tpu.utils.utils import run_shell_command
            prep_script = (SETTINGS.PKG_RESOURCES / "get_dataset_kitti_raw.sh").resolve()
            run_shell_command(f"{prep_script} {cls.DEFAULT_DATA_DIR}")
