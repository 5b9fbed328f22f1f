r"""Base class for all video prediction dataset loaders.

TPU-native analog of the reference ``VPDataset``
(``vp_suite/base/base_dataset.py:26-400``): same constants, sequence-length
negotiation, split semantics and preprocessing workflow, but producing numpy
arrays in the framework-native **THWC** layout (channels last, so batches can
be transferred to TPU and consumed by NHWC convolutions without transposes).
"""
import random as _pyrandom
import sys
from copy import deepcopy
from pathlib import Path
from typing import TypedDict

import numpy as np

from vp_suite_tpu.utils.utils import set_from_kwarg, get_public_attrs, PytestExpectedException
from vp_suite_tpu.utils import transforms as T


class VPData(TypedDict):
    r"""Return type of all datasets (parity: ``base_dataset.py:26-32``), with
    the TPU-native THWC layout."""
    frames: np.ndarray  #: Video frames [t, h, w, c], float32, in value range.
    actions: np.ndarray  #: Actions per frame [t, a], float32.
    origin: str  #: A string specifying the source of the data.


class VPSubset:
    r"""A subset of a dataset at specified indices, forwarding attribute access
    to the underlying dataset (parity: ``base_dataset.py:35-40``)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]

    def __getattr__(self, item):
        return getattr(self.dataset, item)


class VPDataset:
    r"""Base video prediction dataset.

    Not usable until :meth:`set_seq_len` has been called (parity:
    ``base_dataset.py:43-52``).
    """

    NON_CONFIG_VARS = ["functions", "ready_for_usage", "total_frames", "seq_len",
                       "frame_offsets", "data_dir", "transform"]

    # DATASET CONSTANTS (parity: base_dataset.py:56-64)
    NAME: str = NotImplemented
    REFERENCE: str = None
    IS_DOWNLOADABLE: str = None
    ON_THE_FLY: bool = False
    DEFAULT_DATA_DIR: Path = NotImplemented
    VALID_SPLITS = ["train", "test"]
    MIN_SEQ_LEN: int = NotImplemented
    ACTION_SIZE: int = NotImplemented
    DATASET_FRAME_SHAPE: tuple = NotImplemented  #: (h, w, c) of stored frames.

    # dataset hyper-parameters (parity: base_dataset.py:66-75)
    img_shape: tuple = NotImplemented  #: (c, h, w) as returned in configs (reference ordering).
    train_to_val_ratio: float = 0.8
    train_val_seed = 1234
    transform = None
    split: str = None
    seq_step: int = 1
    data_dir: str = None
    value_range_min: float = 0.0
    value_range_max: float = 1.0

    def __init__(self, split: str, **dataset_kwargs):
        if split not in self.VALID_SPLITS:
            raise ValueError(f"parameter '{split}' has to be one of the following: {self.VALID_SPLITS}")
        self.split = split

        set_from_kwarg(self, dataset_kwargs, "seq_step")
        self.data_dir = dataset_kwargs.get("data_dir", self.data_dir)
        if self.data_dir is None:
            if not self.default_available(self.split, **dataset_kwargs):
                if "pytest" in sys.modules:
                    raise PytestExpectedException(f"Default for Dataset '{self.NAME}' is unavailable "
                                                  f"and pytest won't download it")
                print(f"downloading/preparing dataset '{self.NAME}' "
                      f"and saving it to '{self.DEFAULT_DATA_DIR}'...")
                self.download_and_prepare_dataset()
            self.data_dir = str(Path(self.DEFAULT_DATA_DIR).resolve())

        # preprocessing: convert -> layout -> scale -> crop -> resize -> augment
        transforms = []
        set_from_kwarg(self, dataset_kwargs, "value_range_min")
        set_from_kwarg(self, dataset_kwargs, "value_range_max")

        crop = dataset_kwargs.get("crop", None)
        crop_out_hw = None
        if crop is not None:
            if type(crop) not in T.CROPS:
                raise ValueError(f"for the parameter 'crop', only the following transforms "
                                 f"are allowed: {T.CROPS}")
            transforms.append(crop)
            crop_out_hw = crop.size

        img_size = dataset_kwargs.get("img_size", None)
        h, w, c = self.DATASET_FRAME_SHAPE
        if crop_out_hw is not None:
            h, w = crop_out_hw
        if img_size is None:
            h_, w_ = h, w
        elif isinstance(img_size, int):
            h_, w_ = img_size, img_size
        elif isinstance(img_size, (list, tuple)) and len(img_size) == 2:
            h_, w_ = img_size
        else:
            raise ValueError("invalid img size provided, expected either None, int or a "
                             "two-element list/tuple")
        self.img_shape = (c, h_, w_)
        if (h, w) != (h_, w_):
            transforms.append(T.Resize((h_, w_)))

        augmentations = dataset_kwargs.get("augmentations", [])
        for aug in augmentations:
            if type(aug) not in T.SHAPE_PRESERVING_AUGMENTATIONS:
                raise ValueError(f"within the parameter 'augmentations', only the following "
                                 f"transformations are allowed: {T.SHAPE_PRESERVING_AUGMENTATIONS}")
            transforms.append(aug)

        self.transform = T.Identity() if len(transforms) == 0 else T.Compose(transforms)
        self.ready_for_usage = False

    @property
    def config(self) -> dict:
        r"""Complete dataset configuration as a flat dict (parity:
        ``base_dataset.py:147-163``)."""
        attr_dict = get_public_attrs(self, "config", non_config_vars=self.NON_CONFIG_VARS)
        img_c, img_h, img_w = self.img_shape
        extra_config = {
            "img_h": img_h,
            "img_w": img_w,
            "img_c": img_c,
            "action_size": self.ACTION_SIZE,
            "tensor_value_range": [self.value_range_min, self.value_range_max],
            "NAME": self.NAME,
        }
        return {**attr_dict, **extra_config}

    def set_seq_len(self, context_frames: int, pred_frames: int, seq_step: int):
        r"""Sequence-length negotiation: ``seq_len = (ctx+pred-1)*step + 1``
        checked against ``MIN_SEQ_LEN`` (parity: ``base_dataset.py:165-191``)."""
        total_frames = context_frames + pred_frames
        seq_len = (total_frames - 1) * seq_step + 1
        if self.MIN_SEQ_LEN < seq_len:
            raise ValueError(f"Dataset '{self.NAME}' supports videos with up to {self.MIN_SEQ_LEN} "
                             f"frames, which is exceeded by your configuration: "
                             f"{{context frames: {context_frames}, pred frames: {pred_frames}, "
                             f"seq step: {seq_step}}}")
        self.total_frames = total_frames
        self.seq_len = seq_len
        self.seq_step = seq_step
        self.frame_offsets = range(0, total_frames * seq_step, seq_step)
        self._set_seq_len()
        self.ready_for_usage = True

    def _set_seq_len(self):
        r"""Optional dataset-specific logic for :meth:`set_seq_len`."""
        pass

    def reset_rng(self):
        r"""Optional logic for resetting the RNG of a dataset."""
        pass

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, i) -> VPData:
        raise NotImplementedError

    def preprocess(self, x: np.ndarray, transform: bool = True) -> np.ndarray:
        r"""Converts raw frames to float32 THWC in the configured value range
        (parity workflow: ``base_dataset.py:208-273``, with the permute going
        channels-LAST instead of channels-first).

        Accepts [..., h, w] (grayscale, channel appended), [..., h, w, c]
        uint8/uint16/float arrays.
        """
        x = np.asarray(x)
        if x.dtype == np.uint16:
            x = x.astype(np.float32) / ((1 << 16) - 1)
        elif x.dtype == np.uint8:
            x = x.astype(np.float32) / ((1 << 8) - 1)
        elif x.dtype == np.float64:
            # parity: the reference divides only np.float (float64) inputs by 255
            # and rejects float32 (base_dataset.py:236-242); mirroring that here
            # avoids silently re-scaling already-normalized float32 frames.
            x = x.astype(np.float32) / ((1 << 8) - 1)
        else:
            raise ValueError(
                f"only dtypes np.uint8, np.uint16 and np.float64 are supported "
                f"(given: {x.dtype}). Already-normalized float32 frames should "
                f"be fed as float64 scaled by 255 (x.astype(np.float64) * 255) "
                f"or quantized to uint8")

        if x.ndim < 2:
            raise ValueError("expected at least two dimensions for input image")
        elif x.ndim == 2:
            x = x[..., None]  # [h, w] -> [h, w, 1]
        # else: assume channels-last already ([..., h, w, c])

        # scale to [value_range_min, value_range_max]
        if self.value_range_min != 0.0 or self.value_range_max != 1.0:
            x = x * (self.value_range_max - self.value_range_min) + self.value_range_min

        if transform:
            x = self.transform(x)
        return np.ascontiguousarray(x, dtype=np.float32)

    def postprocess(self, x) -> np.ndarray:
        r"""Converts value-range THWC floats back to uint8 [..., h, w, c]
        (parity: ``base_dataset.py:275-298``; no permute needed since the
        native layout is already channels-last)."""
        x = np.asarray(x, dtype=np.float32)
        if x.ndim < 3:
            raise ValueError("expected at least three dimensions for input image")
        x = x - self.value_range_min
        x = x / (self.value_range_max - self.value_range_min)
        x = np.clip(x * 255.0, 0.0, 255.0)
        return x.astype(np.uint8)

    def default_available(self, split: str, **dataset_kwargs):
        r"""Probes whether the dataset at the default data dir is usable
        (parity: ``base_dataset.py:300-321``)."""
        try:
            kwargs_ = deepcopy(dataset_kwargs)
            kwargs_.update({"data_dir": str(self.DEFAULT_DATA_DIR)})
            default_ = self.__class__(split, **kwargs_)
            default_.set_seq_len(1, 1, 1)
            _ = default_[0]
        except (FileNotFoundError, ValueError, IndexError, RuntimeError):
            return False
        return True

    @classmethod
    def download_and_prepare_dataset(cls):
        raise NotImplementedError

    @classmethod
    def get_train_val(cls, **dataset_kwargs):
        r"""Creates (train, val) datasets; seeded random split when the dataset
        has no dedicated 'val' split (parity: ``base_dataset.py:332-358``)."""
        assert cls.VALID_SPLITS in (["train", "test"], ["train", "val", "test"]), \
            f"parameter 'VALID_SPLITS' of dataset class '{cls.__name__}' is ill-configured"
        if cls.VALID_SPLITS == ["train", "test"]:
            d_main = cls("train", **dataset_kwargs)
            len_main = len(d_main)
            len_train = int(len_main * cls.train_to_val_ratio)
            len_val = len_main - len_train
            d_train, d_val = _random_split(d_main, [len_train, len_val], cls.train_val_seed)
        else:
            d_train = cls("train", **dataset_kwargs)
            d_val = cls("val", **dataset_kwargs)
        return d_train, d_val

    @classmethod
    def get_test(cls, **dataset_kwargs):
        return cls("test", **dataset_kwargs)


def _random_split(dataset, lengths, random_seed: int):
    r"""Seeded random split into VPSubsets (parity: ``base_dataset.py:377-400``;
    identical shuffle algorithm so split membership matches the reference)."""
    if sum(lengths) != len(dataset):
        raise ValueError("Sum of input lengths does not equal the length of the input dataset!")
    indices = list(range(sum(lengths)))
    _pyrandom.Random(random_seed).shuffle(indices)
    subsets, offset = [], 0
    for length in lengths:
        subsets.append(VPSubset(dataset, indices[offset:offset + length]))
        offset += length
    return subsets
