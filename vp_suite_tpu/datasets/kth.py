r"""KTH Actions dataset.

Capability parity with ``vp_suite/datasets/kth.py:12-96``: per-class metadata
(one record per video chunk listing its frame files) + extracted PNG frames,
seeded random window selection and last-frame padding for short sequences.

Metadata format: this framework's prepare pipeline writes JSON
(``{split}_meta64x64.json``) instead of the reference's torch-serialized
``.t7`` files (the ``torchfile`` reader is not available here); existing ``.t7``
metadata is read too if the ``torchfile`` package is importable.
"""
import json
import os
import random
from pathlib import Path

import numpy as np

from vp_suite_tpu.base.base_dataset import VPDataset, VPData
from vp_suite_tpu.defaults import SETTINGS


class KTHActionsDataset(VPDataset):
    NAME = "KTH Actions"
    REFERENCE = "https://doi.org/10.1109/ICPR.2004.1334462"
    IS_DOWNLOADABLE = "Yes"
    DEFAULT_DATA_DIR = SETTINGS.DATA_PATH / "kth_actions"
    CLASSES = ['boxing', 'handclapping', 'handwaving', 'walking', 'running', 'jogging']
    SHORT_CLASSES = ['walking', 'running', 'jogging']
    MIN_SEQ_LEN = 30
    ACTION_SIZE = 0
    DATASET_FRAME_SHAPE = (64, 64, 3)

    first_frame_rng_seed = 1234

    def __init__(self, split, **dataset_kwargs):
        super().__init__(split, **dataset_kwargs)
        self.NON_CONFIG_VARS.extend(["data"])

        self.data_dir = str((Path(self.data_dir) / "processed").resolve())
        self.data = {c: self._load_meta(c) for c in self.CLASSES}

    def _load_meta(self, c):
        r"""Loads per-class metadata: list of {vid: str, files: [[str, ...], ...]}
        — per video dir, a list of subsequences, each a list of frame files
        (the reference's .t7 structure, ``kth.py:47-60``)."""
        h, w = self.DATASET_FRAME_SHAPE[0], self.DATASET_FRAME_SHAPE[1]
        json_fp = os.path.join(self.data_dir, c, f"{self.split}_meta{h}x{w}.json")
        if os.path.exists(json_fp):
            with open(json_fp, "r") as f:
                return json.load(f)
        t7_fp = os.path.join(self.data_dir, c, f"{self.split}_meta{h}x{w}.t7")
        if os.path.exists(t7_fp):
            import torchfile
            raw = torchfile.load(t7_fp)
            return [{"vid": vid[b"vid"].decode("utf-8"),
                     "files": [[fn.decode("utf-8") for fn in seq]
                               for seq in vid[b"files"]]} for vid in raw]
        raise FileNotFoundError(f"no KTH metadata for class '{c}' at {json_fp}")

    def get_from_idx(self, i):
        for c, c_data in self.data.items():
            len_c_data = sum(len(vid["files"]) for vid in c_data)
            if i >= len_c_data:
                i -= len_c_data
                continue
            for vid in c_data:
                len_vid = len(vid["files"])
                if i < len_vid:
                    return c, vid, vid["files"][i]
                i -= len_vid
        raise ValueError("invalid i")

    def __getitem__(self, i) -> VPData:
        if not self.ready_for_usage:
            raise RuntimeError("Dataset is not yet ready for usage "
                               "(maybe you forgot to call set_seq_len()).")
        import imageio.v2 as imageio
        c, vid, seq = self.get_from_idx(i)
        dname = os.path.join(self.data_dir, c, vid["vid"])
        frames = np.zeros((self.seq_len, *self.DATASET_FRAME_SHAPE))
        if len(seq) <= self.seq_len:
            first_frame = 0
        else:
            first_frame = random.Random(self.first_frame_rng_seed).randint(
                0, len(seq) - self.seq_len)
        last_frame = len(seq) - 1 if len(seq) <= self.seq_len else first_frame + self.seq_len - 1
        for fi in range(first_frame, last_frame + 1):
            img = imageio.imread(os.path.join(dname, seq[fi]))
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, axis=-1)
            frames[fi - first_frame] = img
        for fi in range(last_frame + 1, self.seq_len):
            frames[fi] = frames[last_frame]

        rgb = self.preprocess(np.array(frames))
        actions = np.zeros((self.total_frames, 1), dtype=np.float32)
        return {"frames": rgb, "actions": actions,
                "origin": f"{dname}, start frame: {first_frame}"}

    def __len__(self):
        return sum(sum(len(vid["files"]) for vid in c_data) for c_data in self.data.values())

    @classmethod
    def download_and_prepare_dataset(cls):
        from vp_suite_tpu.utils.utils import run_shell_command
        prep_script = (SETTINGS.PKG_RESOURCES / "get_dataset_kth.sh").resolve()
        run_shell_command(f"{prep_script} {str(cls.DEFAULT_DATA_DIR.resolve())}")
        build_kth_metadata(cls.DEFAULT_DATA_DIR / "processed", cls.CLASSES)


def build_kth_metadata(processed_dir: Path, classes, frame_hw=(64, 64),
                       test_persons=range(21, 26)):
    r"""Builds the JSON metadata from extracted frame directories. Directory
    layout (from the prepare script): ``processed/<class>/<person_vid_dir>/*.png``;
    persons 21-25 form the test split (the standard KTH protocol)."""
    h, w = frame_hw
    test_set = {f"person{p:02d}" for p in test_persons}
    for c in classes:
        c_dir = processed_dir / c
        if not c_dir.is_dir():
            continue
        split_meta = {"train": [], "test": []}
        for vid_dir in sorted(d for d in c_dir.iterdir() if d.is_dir()):
            files = sorted(fp.name for fp in vid_dir.glob("*.png"))
            if not files:
                continue
            person = vid_dir.name.split("_")[0]
            split = "test" if person in test_set else "train"
            # one subsequence covering the whole video dir (the reference's
            # .t7 metadata may carry several annotated subsequences per video)
            split_meta[split].append({"vid": vid_dir.name, "files": [files]})
        for split, meta in split_meta.items():
            with open(c_dir / f"{split}_meta{h}x{w}.json", "w") as f:
                json.dump(meta, f)
