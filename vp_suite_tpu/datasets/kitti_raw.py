r"""KITTI raw dataset.

Capability parity with ``vp_suite/datasets/kitti_raw.py:13-113``: PNG directory
tree per drive & camera, two-level seeded split (trainval/test then train/val),
non-overlapping window indexing.
"""
from pathlib import Path

import numpy as np

from vp_suite_tpu.base.base_dataset import VPDataset, VPData
from vp_suite_tpu.defaults import SETTINGS
from vp_suite_tpu.utils.utils import set_from_kwarg, seeded_shuffle_split


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
        for attr in ("camera", "trainval_to_test_ratio", "train_to_val_ratio",
                     "trainval_test_seed", "train_val_seed"):
            set_from_kwarg(self, dataset_kwargs, attr)

        # directory layout: <data_dir>/<recording day>/<drive>/<camera>/data/*.png
        drive_dirs = [drive
                      for day in Path(self.data_dir).iterdir() if day.is_dir()
                      for drive in day.iterdir() if drive.is_dir()]
        if len(drive_dirs) < 3:
            raise ValueError(f"Dataset {self.NAME}: need at least 3 drive "
                             f"sequences to form train/val/test splits, "
                             f"found {len(drive_dirs)}")

        # two-level seeded split (membership convention of the reference)
        trainval, test = seeded_shuffle_split(
            drive_dirs, self.trainval_to_test_ratio, self.trainval_test_seed,
            at_least_one=True)
        if self.split == "test":
            chosen = test
        else:
            train, val = seeded_shuffle_split(
                trainval, self.train_to_val_ratio, self.train_val_seed,
                at_least_one=True)
            chosen = train if self.split == "train" else val

        self.sequences = [
            (drive, len(list(drive.rglob(f"{self.camera}/data/*.png"))))
            for drive in sorted(chosen)]
        self.sequences_with_frame_index = []

    def _set_seq_len(self):
        # non-overlapping windows: consecutive starts are one full window apart
        stride = self.seq_len + self.seq_step - 1
        self.sequences_with_frame_index = [
            (drive, start)
            for drive, n_frames in self.sequences
            for start in range(0, n_frames - self.seq_len + 1, stride)]

    def __getitem__(self, i) -> VPData:
        import cv2
        drive, start = self.sequences_with_frame_index[i]
        frame_paths = sorted(drive.rglob(f"{self.camera}/data/*.png"))
        window = frame_paths[start:start + self.seq_len:self.seq_step]
        frames = np.stack(
            [cv2.cvtColor(cv2.imread(str(fp.resolve())), cv2.COLOR_BGR2RGB)
             for fp in window], axis=0)
        vid = self.preprocess(frames)
        actions = np.zeros((self.total_frames, 1), dtype=np.float32)
        return {"frames": vid, "actions": actions,
                "origin": f"{drive}, start frame: {start}"}

    def __len__(self):
        return len(self.sequences_with_frame_index)

    @classmethod
    def download_and_prepare_dataset(cls):
        d_path = cls.DEFAULT_DATA_DIR
        d_path.mkdir(parents=True, exist_ok=True)
        try:
            _ = next(d_path.rglob("**/*.png"))
            print(f"Found image data in {str(d_path.resolve())} -> "
                  f"Won't download {cls.NAME}")
        except StopIteration:
            from vp_suite_tpu.utils.utils import run_shell_command
            prep_script = (SETTINGS.PKG_RESOURCES / "get_dataset_kitti_raw.sh").resolve()
            run_shell_command(f"{prep_script} {cls.DEFAULT_DATA_DIR}")
