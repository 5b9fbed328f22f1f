r"""Host-side data transforms (crop / resize / augment).

TPU-native replacement for the reference's torchvision transform pipeline
(``vp_suite/base/base_dataset.py:18-23,106-145``): pure-numpy callables over
``[..., h, w, c]`` arrays, each carrying its own seeded RNG so augmentation is
reproducible per split. Heavy per-batch work (normalize/resize) can instead be
done on-device; these run in the host input pipeline.
"""
import numpy as np


class Transform:
    r"""Base class; subclasses implement ``__call__(x)`` on [..., h, w, c]."""
    SHAPE_PRESERVING = True

    def reset_rng(self, seed=0):
        self._rng = np.random.default_rng(seed)


class Compose(Transform):
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x

    def reset_rng(self, seed=0):
        for i, t in enumerate(self.transforms):
            t.reset_rng(seed + i)


class Identity(Transform):
    def __call__(self, x):
        return x


class CenterCrop(Transform):
    SHAPE_PRESERVING = False

    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        th, tw = self.size
        i = max((h - th) // 2, 0)
        j = max((w - tw) // 2, 0)
        return x[..., i:i + th, j:j + tw, :]


class RandomCrop(Transform):
    SHAPE_PRESERVING = False

    def __init__(self, size, seed=0):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.reset_rng(seed)

    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        th, tw = self.size
        i = int(self._rng.integers(0, max(h - th, 0) + 1))
        j = int(self._rng.integers(0, max(w - tw, 0) + 1))
        return x[..., i:i + th, j:j + tw, :]


class Resize(Transform):
    SHAPE_PRESERVING = False

    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, x):
        import cv2
        th, tw = self.size
        lead = x.shape[:-3]
        h, w, c = x.shape[-3:]
        flat = x.reshape((-1, h, w, c))
        out = np.empty((flat.shape[0], th, tw, c), dtype=x.dtype)
        for idx in range(flat.shape[0]):
            r = cv2.resize(np.asarray(flat[idx], dtype=np.float32), (tw, th),
                           interpolation=cv2.INTER_LINEAR)
            out[idx] = r.reshape(th, tw, c)
        return out.reshape((*lead, th, tw, c))


class RandomHorizontalFlip(Transform):
    def __init__(self, p=0.5, seed=0):
        self.p = p
        self.reset_rng(seed)

    def __call__(self, x):
        if self._rng.random() < self.p:
            return x[..., :, ::-1, :].copy()
        return x


class RandomVerticalFlip(Transform):
    def __init__(self, p=0.5, seed=0):
        self.p = p
        self.reset_rng(seed)

    def __call__(self, x):
        if self._rng.random() < self.p:
            return x[..., ::-1, :, :].copy()
        return x


class RandomRotation(Transform):
    r"""Rotates by a random angle in [-degrees, degrees] (bilinear, zero-fill)."""

    def __init__(self, degrees, seed=0):
        self.degrees = degrees
        self.reset_rng(seed)

    def __call__(self, x):
        import cv2
        angle = float(self._rng.uniform(-self.degrees, self.degrees))
        lead = x.shape[:-3]
        h, w, c = x.shape[-3:]
        m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
        flat = x.reshape((-1, h, w, c))
        out = np.empty_like(flat)
        for idx in range(flat.shape[0]):
            r = cv2.warpAffine(np.asarray(flat[idx], dtype=np.float32), m, (w, h))
            out[idx] = r.reshape(h, w, c)
        return out.reshape((*lead, h, w, c))


class GaussianBlur(Transform):
    def __init__(self, kernel_size=3, sigma=1.0):
        self.kernel_size = kernel_size
        self.sigma = sigma

    def __call__(self, x):
        import cv2
        lead = x.shape[:-3]
        h, w, c = x.shape[-3:]
        flat = x.reshape((-1, h, w, c))
        out = np.empty_like(flat)
        k = (self.kernel_size, self.kernel_size)
        for idx in range(flat.shape[0]):
            r = cv2.GaussianBlur(np.asarray(flat[idx], dtype=np.float32), k, self.sigma)
            out[idx] = r.reshape(h, w, c)
        return out.reshape((*lead, h, w, c))


class Grayscale(Transform):
    def __call__(self, x):
        gray = x[..., :3] @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
        return np.repeat(gray[..., None], x.shape[-1], axis=-1)


class RandomGrayscale(Transform):
    def __init__(self, p=0.1, seed=0):
        self.p = p
        self._gray = Grayscale()
        self.reset_rng(seed)

    def __call__(self, x):
        if self._rng.random() < self.p:
            return self._gray(x)
        return x


CROPS = [CenterCrop, RandomCrop]
SHAPE_PRESERVING_AUGMENTATIONS = [
    RandomHorizontalFlip, RandomVerticalFlip, RandomRotation, GaussianBlur,
    Grayscale, RandomGrayscale,
]
