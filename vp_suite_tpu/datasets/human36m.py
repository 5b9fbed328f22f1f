r"""Human 3.6M dataset.

Capability parity with ``vp_suite/datasets/human36m.py:14-118``: mp4 videos
under ``training/`` / ``testing/`` roots with a prepare-time
``frame_counts.json`` sidecar per root, scenario filtering by filename,
non-overlapping clip windows that skip the first ``SKIP_FIRST_N`` frames,
and resize-on-read (the raw 1000x1000 frames are decoded straight to the
target size).

Split/window semantics are the reference's; the indexing machinery lives in
:mod:`vp_suite_tpu.datasets._indexing` (shared across the file-backed
loaders).
"""
from pathlib import Path

from vp_suite_tpu.base.base_dataset import VPDataset, VPData
from vp_suite_tpu.datasets import _indexing as idx
from vp_suite_tpu.defaults import SETTINGS
from vp_suite_tpu.utils.utils import set_from_kwarg


class Human36MDataset(VPDataset):
    NAME = "Human 3.6M"
    REFERENCE = "http://vision.imar.ro/human3.6m/description.php"
    IS_DOWNLOADABLE = "With Registered Account"
    DEFAULT_DATA_DIR = SETTINGS.DATA_PATH / "human36m"
    VALID_SPLITS = ["train", "val", "test"]
    MIN_SEQ_LEN = 994
    ACTION_SIZE = 0
    DATASET_FRAME_SHAPE = (1000, 1000, 3)
    FPS = 50
    SKIP_FIRST_N = 25
    ALL_SCENARIOS = ['Directions', 'Discussion', 'Eating', 'Greeting', 'Phoning', 'Photo',
                     'Posing', 'Purchases', 'Sitting', 'SittingDown', 'Smoking', 'TakingPhoto',
                     'Waiting', 'WalkDog', 'WalkTogether', 'Walking', 'WalkingDog']

    train_to_val_ratio = 0.96
    scenarios = None

    def __init__(self, split, **dataset_kwargs):
        super().__init__(split, **dataset_kwargs)
        self.NON_CONFIG_VARS.extend(["sequences", "ALL_SCENARIOS"])
        set_from_kwarg(self, dataset_kwargs, "scenarios", default=self.ALL_SCENARIOS,
                       choices=self.ALL_SCENARIOS)
        set_from_kwarg(self, dataset_kwargs, "train_val_seed")

        # the dataset ships pre-partitioned roots; train/val carve up training/
        root = Path(self.data_dir) / ("testing" if split == "test" else "training")
        self.data_dir = str(root.resolve())
        self.sequences = self._split_sequences()
        self._windows = []

    @staticmethod
    def _scenario_of(fp):
        r"""'.../Walking 1.55011271.mp4' -> 'Walking' (filename convention)."""
        return Path(fp).name.split(".")[0].split(" ")[0]

    def _split_sequences(self):
        counts = idx.load_frame_counts(self.data_dir)
        pool = [(fp, n) for fp, n in counts.items()
                if self._scenario_of(fp) in self.scenarios]
        if self.split == "test":
            return pool
        return idx.split_members(pool, self.split, self.train_to_val_ratio,
                                 self.train_val_seed)

    def _set_seq_len(self):
        self._windows = idx.build_window_index(self.sequences, self.seq_len,
                                               self.seq_step,
                                               skip_first=self.SKIP_FIRST_N)

    def __len__(self):
        return len(self._windows)

    def __getitem__(self, i) -> VPData:
        fp, start = self._windows[i]
        clip = idx.read_strided_clip(fp, start, self.seq_len, self.seq_step,
                                     img_size=self.img_shape[1:])
        # transform=False: already resized at decode time
        return idx.actionless_item(self, clip, transform=False,
                                   origin=f"{fp}, start frame: {start}")

    @classmethod
    def download_and_prepare_dataset(cls):
        d_path = cls.DEFAULT_DATA_DIR
        d_path.mkdir(parents=True, exist_ok=True)
        if len(list(d_path.rglob("**/*.mp4"))) == 0:
            from vp_suite_tpu.utils.utils import run_shell_command
            prep_script = (SETTINGS.PKG_RESOURCES / "get_dataset_human36m.sh").resolve()
            run_shell_command(f"{prep_script} {cls.DEFAULT_DATA_DIR}")
        print("Analyzing video frame counts...")
        for root in ["training", "testing"]:
            idx.write_frame_counts(d_path / root,
                                   (d_path / root).rglob("**/*.mp4"))
