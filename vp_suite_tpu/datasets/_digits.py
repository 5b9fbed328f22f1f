r"""Digit template sources for the on-the-fly Moving MNIST generator.

The reference samples digit images from torchvision's MNIST
(``vp_suite/datasets/mmnist_on_the_fly.py:54,149-155``). In a zero-egress
environment MNIST may be unavailable, so two sources are provided:

- ``MNISTSource``: parses raw MNIST idx files if present in the data dir.
- ``SyntheticDigitSource``: deterministic cv2-rendered digit glyphs (several
  font/thickness variants per digit) — same 28x28 float templates, fully
  reproducible, no downloads.
"""
import gzip
import struct
from pathlib import Path

import numpy as np


class MNISTSource:
    r"""Loads MNIST digit images from raw idx(.gz) files."""

    FILES = {
        "train": ["train-images-idx3-ubyte", "train-images.idx3-ubyte"],
        "test": ["t10k-images-idx3-ubyte", "t10k-images.idx3-ubyte"],
    }

    def __init__(self, data_dir, train=True):
        split = "train" if train else "test"
        fp = self._find(data_dir, self.FILES[split])
        if fp is None:
            raise FileNotFoundError(f"no MNIST idx file for split '{split}' under {data_dir}")
        self.images = self._load_idx(fp)

    @staticmethod
    def _find(data_dir, names):
        data_dir = Path(data_dir)
        for name in names:
            for cand in [data_dir / name, data_dir / f"{name}.gz",
                         data_dir / "MNIST" / "raw" / name,
                         data_dir / "MNIST" / "raw" / f"{name}.gz"]:
                if cand.exists():
                    return cand
        return None

    @staticmethod
    def _load_idx(fp):
        fp = Path(fp)
        opener = gzip.open if fp.suffix == ".gz" else open
        with opener(fp, "rb") as f:
            magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
            if magic != 2051:
                raise ValueError(f"bad idx magic in {fp}: {magic}")
            data = np.frombuffer(f.read(n * rows * cols), dtype=np.uint8)
        return data.reshape(n, rows, cols)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return self.images[i]  # uint8 [28, 28]


class SyntheticDigitSource:
    r"""Deterministic digit glyphs rendered with cv2 Hershey fonts.

    Provides ``n_variants`` 28x28 uint8 templates: 10 digits x fonts x
    thicknesses, indexed like an MNIST array so the sampling logic of the
    generator is unchanged.
    """

    def __init__(self, size=28, seed=0):
        import cv2
        fonts = [cv2.FONT_HERSHEY_SIMPLEX, cv2.FONT_HERSHEY_DUPLEX,
                 cv2.FONT_HERSHEY_COMPLEX, cv2.FONT_HERSHEY_TRIPLEX,
                 cv2.FONT_HERSHEY_SCRIPT_SIMPLEX]
        thicknesses = [1, 2]
        templates = []
        for digit in range(10):
            for font in fonts:
                for thick in thicknesses:
                    img = np.zeros((size, size), dtype=np.uint8)
                    text = str(digit)
                    scale = cv2.getFontScaleFromHeight(font, size - 8, thick)
                    (tw, th), baseline = cv2.getTextSize(text, font, scale, thick)
                    org = ((size - tw) // 2, (size + th) // 2)
                    cv2.putText(img, text, org, font, scale, 255, thick, cv2.LINE_AA)
                    templates.append(img)
        self.images = np.stack(templates, axis=0)

    def __len__(self):
        return 60000  # same index space as MNIST train

    def __getitem__(self, i):
        return self.images[i % len(self.images)]


def open_digit_source(data_dir, train=True, source="auto"):
    r"""Returns (source_obj, kind). ``source``: 'auto' | 'mnist' | 'synthetic'."""
    if source in ("auto", "mnist"):
        try:
            return MNISTSource(data_dir, train=train), "mnist"
        except (FileNotFoundError, ValueError):
            if source == "mnist":
                raise
    return SyntheticDigitSource(), "synthetic"
