r"""Dataset wrapper bundling main/train/val or main/test datasets.

Capability parity with ``vp_suite/utils/dataset_wrapper.py:4-149``.
"""
from vp_suite_tpu.datasets import DATASET_CLASSES


class VPDatasetWrapper:
    r"""Wraps one dataset class into a {main, train, val} or {main, test}
    dict, exposing convenient properties and fan-out methods."""

    ALLOWED_SPLITS = ["train", "test"]

    def __init__(self, dataset_class, split, **dataset_kwargs):
        if isinstance(dataset_class, str):
            dataset_class = DATASET_CLASSES[dataset_class]
        self.dataset_class = dataset_class
        if split not in self.ALLOWED_SPLITS:
            raise ValueError(f"split must be one of {self.ALLOWED_SPLITS}")
        self.split = split
        if split == "train":
            d_train, d_val = dataset_class.get_train_val(**dataset_kwargs)
            self.datasets = {"main": getattr(d_train, "dataset", d_train),
                             "train": d_train, "val": d_val}
        else:
            d_test = dataset_class.get_test(**dataset_kwargs)
            self.datasets = {"main": d_test, "test": d_test}

    @property
    def NAME(self):
        return self.dataset_class.NAME

    @property
    def is_training_set(self):
        return self.split == "train"

    @property
    def is_test_set(self):
        return self.split == "test"

    @property
    def train_data(self):
        if not self.is_training_set:
            raise ValueError("this wrapper holds a test dataset")
        return self.datasets["train"]

    @property
    def val_data(self):
        if not self.is_training_set:
            raise ValueError("this wrapper holds a test dataset")
        return self.datasets["val"]

    @property
    def test_data(self):
        if not self.is_test_set:
            raise ValueError("this wrapper holds a training dataset")
        return self.datasets["test"]

    @property
    def config(self):
        return self.datasets["main"].config

    @property
    def img_shape(self):
        return self.datasets["main"].img_shape

    @property
    def action_size(self):
        return self.datasets["main"].ACTION_SIZE

    def set_seq_len(self, context_frames, pred_frames, seq_step):
        r"""Fans out set_seq_len to all contained datasets (parity:
        ``dataset_wrapper.py:126-141``)."""
        main = self.datasets["main"]
        main.set_seq_len(context_frames, pred_frames, seq_step)
        for key, d in self.datasets.items():
            if key != "main" and getattr(d, "dataset", None) is not main and d is not main:
                d.set_seq_len(context_frames, pred_frames, seq_step)

    def reset_rng(self):
        for d in set(id(d.dataset if hasattr(d, "dataset") else d) for d in self.datasets.values()):
            pass
        seen = set()
        for d in self.datasets.values():
            base = d.dataset if hasattr(d, "dataset") else d
            if id(base) not in seen:
                base.reset_rng()
                seen.add(id(base))

    def is_ready(self):
        return all(getattr(d, "ready_for_usage", False) for d in self.datasets.values())

    def __repr__(self):
        return f"VPDatasetWrapper({self.NAME}, split={self.split})"
