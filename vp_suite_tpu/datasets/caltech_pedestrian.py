r"""Caltech Pedestrian dataset.

Capability parity with ``vp_suite/datasets/caltech_pedestrian.py:14-124``:
``.seq`` dashcam videos, the official set00-05 (train/val) vs set06-10 (test)
partition, a seeded train/val cut, and a prepare-time ``frame_counts.json``
sidecar (cv2's frame count is unreliable for .seq containers, so counts are
established by decoding each sequence once).

Split/window semantics are the reference's; the indexing machinery lives in
:mod:`vp_suite_tpu.datasets._indexing` (shared across the file-backed
loaders).
"""
from pathlib import Path

from vp_suite_tpu.base.base_dataset import VPDataset, VPData
from vp_suite_tpu.datasets import _indexing as idx
from vp_suite_tpu.defaults import SETTINGS
from vp_suite_tpu.utils.utils import set_from_kwarg


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
        self.NON_CONFIG_VARS.extend(["sequences"])
        set_from_kwarg(self, dataset_kwargs, "train_to_val_ratio")
        set_from_kwarg(self, dataset_kwargs, "train_val_seed")
        self.sequences = self._split_sequences()
        self._windows = []

    def _split_sequences(self):
        r"""``(path, frame_count)`` pairs belonging to this split: the
        official set partition first, then — for train/val — the seeded
        ratio cut."""
        counts = idx.load_frame_counts(self.data_dir)
        wanted = self.TEST_SETS if self.split == "test" else self.TRAIN_VAL_SETS
        pool = [(fp, n) for fp, n in counts.items()
                if Path(fp).parent.name in wanted]
        if self.split == "test":
            if not pool:
                raise ValueError(f"Dataset {self.NAME}: didn't find enough test "
                                 f"sequences -> can't use dataset")
            return pool
        if len(pool) < 2:
            raise ValueError(f"Dataset {self.NAME}: didn't find enough train/val "
                             f"sequences -> can't use dataset")
        return idx.split_members(pool, self.split, self.train_to_val_ratio,
                                 self.train_val_seed, at_least_one=True)

    def _set_seq_len(self):
        self._windows = idx.build_window_index(self.sequences, self.seq_len,
                                               self.seq_step)

    def __len__(self):
        return len(self._windows)

    def __getitem__(self, i) -> VPData:
        fp, start = self._windows[i]
        clip = idx.read_strided_clip(fp, start, self.seq_len, self.seq_step)
        return idx.actionless_item(self, clip,
                                   origin=f"{fp}, start frame: {start}")

    @classmethod
    def download_and_prepare_dataset(cls):
        d_path = cls.DEFAULT_DATA_DIR
        d_path.mkdir(parents=True, exist_ok=True)
        if next(d_path.rglob("**/*.seq"), None) is not None:
            print(f"Found sequence data in {str(d_path.resolve())} "
                  f"-> Won't download {cls.NAME}")
        else:
            from vp_suite_tpu.utils.utils import run_shell_command
            prep_script = (SETTINGS.PKG_RESOURCES
                           / "get_dataset_caltech_pedestrian.sh").resolve()
            run_shell_command(f"{prep_script} {cls.DEFAULT_DATA_DIR}")
        if not (d_path / "frame_counts.json").exists():
            print("Analyzing video frame counts...")
            # decode-based counting (get_frame_count's header count is
            # unreliable for .seq): read until the stream ends
            import cv2
            counts = {}
            for seq in sorted(d_path.rglob("**/*.seq")):
                cap = cv2.VideoCapture(str(seq.resolve()))
                n = 0
                while cap.read()[0]:
                    n += 1
                counts[str(seq.resolve())] = n
            import json
            with open(d_path / "frame_counts.json", "w") as f:
                json.dump(counts, f)
