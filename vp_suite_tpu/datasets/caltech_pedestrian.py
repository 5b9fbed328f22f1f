r"""Caltech Pedestrian dataset.

Capability parity with ``vp_suite/datasets/caltech_pedestrian.py:14-124``:
``.seq`` videos with the official set00-05 / set06-10 split and a precomputed
``frame_counts.json`` (cv2's frame count is unreliable for .seq files, so
counts are established by decoding each sequence once at prepare time).
"""
import json
import os
import random

import numpy as np

from vp_suite_tpu.base.base_dataset import VPDataset, VPData
from vp_suite_tpu.defaults import SETTINGS
from vp_suite_tpu.utils.utils import set_from_kwarg, read_video


class CaltechPedestrianDataset(VPDataset):
    NAME = "Caltech Pedestrian"
    REFERENCE = "http://www.vision.caltech.edu/Image_Datasets/CaltechPedestrians/"
    IS_DOWNLOADABLE = "Yes"
    DEFAULT_DATA_DIR = SETTINGS.DATA_PATH / "caltech_pedestrian"
    VALID_SPLITS = ["train", "val", "test"]
    MIN_SEQ_LEN = 568
    ACTION_SIZE = 0
    DATASET_FRAME_SHAPE = (480, 640, 3)
    FPS = 30
    TRAIN_VAL_SETS = [f"set{i:02d}" for i in range(6)]
    TEST_SETS = [f"set{i:02d}" for i in range(6, 11)]

    train_to_val_ratio = 0.9

    def __init__(self, split, **dataset_kwargs):
        super().__init__(split, **dataset_kwargs)
        self.NON_CONFIG_VARS.extend(["sequences", "sequences_with_frame_index"])

        set_from_kwarg(self, dataset_kwargs, "train_to_val_ratio")
        set_from_kwarg(self, dataset_kwargs, "train_val_seed")

        with open(os.path.join(self.data_dir, "frame_counts.json"), "r") as f:
            sequences = list(json.load(f).items())

        if self.split == "test":
            sequences = [(fp, fc) for (fp, fc) in sequences
                         if fp.split("/")[-2] in self.TEST_SETS]
            if len(sequences) < 1:
                raise ValueError(f"Dataset {self.NAME}: didn't find enough test sequences "
                                 f"-> can't use dataset")
        else:
            sequences = [(fp, fc) for (fp, fc) in sequences
                         if fp.split("/")[-2] in self.TRAIN_VAL_SETS]
            if len(sequences) < 2:
                raise ValueError(f"Dataset {self.NAME}: didn't find enough train/val "
                                 f"sequences -> can't use dataset")
            slice_idx = max(1, int(len(sequences) * self.train_to_val_ratio))
            random.Random(self.train_val_seed).shuffle(sequences)
            if self.split == "train":
                sequences = sequences[:slice_idx]
            else:
                sequences = sequences[slice_idx:]
        self.sequences = sequences
        self.sequences_with_frame_index = []

    def _set_seq_len(self):
        for sequence_path, frame_count in self.sequences:
            valid_start_idx = range(0, frame_count - self.seq_len + 1,
                                    self.seq_len + self.seq_step - 1)
            for idx in valid_start_idx:
                self.sequences_with_frame_index.append((sequence_path, idx))

    def __getitem__(self, i) -> VPData:
        sequence_path, start_idx = self.sequences_with_frame_index[i]
        vid = read_video(sequence_path, start_index=start_idx, num_frames=self.seq_len)
        vid = vid[::self.seq_step]
        vid = self.preprocess(vid)
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
            _ = next(d_path.rglob("**/*.seq"))
            print(f"Found sequence data in {str(d_path.resolve())} -> Won't download {cls.NAME}")
        except StopIteration:
            from vp_suite_tpu.utils.utils import run_shell_command
            prep_script = (SETTINGS.PKG_RESOURCES / "get_dataset_caltech_pedestrian.sh").resolve()
            run_shell_command(f"{prep_script} {cls.DEFAULT_DATA_DIR}")

        frame_count_path = d_path / "frame_counts.json"
        if not frame_count_path.exists():
            import cv2
            print("Analyzing video frame counts...")
            counts = {}
            for seq in sorted(d_path.rglob("**/*.seq")):
                fp = str(seq.resolve())
                cap = cv2.VideoCapture(fp)
                frames = 0
                while True:
                    ret, _ = cap.read()
                    if not ret:
                        break
                    frames += 1
                counts[fp] = frames
            with open(frame_count_path, "w") as f:
                json.dump(counts, f)
