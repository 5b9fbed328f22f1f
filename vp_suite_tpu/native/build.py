r"""Compile-on-demand loader for the native input-pipeline core.

Builds ``csrc/mmnist_gen.c`` into a shared object with the system C compiler
(cached next to the package) and binds it via ctypes — no pybind11 needed.
Degrades gracefully (returns None) when no compiler is available; callers
fall back to the numpy path.
"""
import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).parent.parent.parent / "csrc" / "mmnist_gen.c"
_CACHE_DIR = Path(__file__).parent / "_build"

_lib = None
_tried = False


def _build_so():
    src = _CSRC.read_text()
    tag = hashlib.sha1(src.encode()).hexdigest()[:12]
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    so_fp = _CACHE_DIR / f"mmnist_gen_{tag}.so"
    if so_fp.exists():
        return so_fp
    cc = os.environ.get("CC", "cc")
    # build to a unique temp file + atomic rename: concurrent builders
    # (loader threads / parallel processes) must not corrupt the cache
    tmp_fp = so_fp.with_suffix(f".tmp{os.getpid()}.so")
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", str(tmp_fp), str(_CSRC)]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp_fp, so_fp)
    return so_fp


def load_mmnist_gen():
    r"""Returns the ctypes library with typed signatures, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        so_fp = _build_so()
        lib = ctypes.CDLL(str(so_fp))
        u8p = np.ctypeslib.ndpointer(dtype=np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
        lib.generate_sequence.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, f32p]
        lib.generate_sequence.restype = ctypes.c_int
        lib.generate_batch.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, f32p]
        lib.generate_batch.restype = ctypes.c_int
        _lib = lib
    except Exception as e:
        import warnings
        warnings.warn(f"native mmnist generator unavailable ({type(e).__name__}: {e}); "
                      f"falling back to the numpy path")
        _lib = None
    return _lib


def native_available() -> bool:
    return load_mmnist_gen() is not None


def generate_sequence_native(digit_templates: np.ndarray, seq_len: int, img_size: int,
                             channels: int, num_digits: int, min_speed: int,
                             max_speed: int, seed: int) -> np.ndarray:
    r"""Generates one [seq_len, img, img, c] float32 sequence with the native
    core. ``digit_templates``: [n, d, d] uint8."""
    lib = load_mmnist_gen()
    if lib is None:
        raise RuntimeError("native generator unavailable (no C compiler?)")
    digit_templates = np.ascontiguousarray(digit_templates, dtype=np.uint8)
    n, d, d2 = digit_templates.shape
    assert d == d2
    out = np.empty((seq_len, img_size, img_size, channels), dtype=np.float32)
    rc = lib.generate_sequence(digit_templates, n, d, seq_len, img_size, channels,
                               num_digits, min_speed, max_speed,
                               np.uint64(seed & 0xFFFFFFFFFFFFFFFF), out)
    if rc != 0:
        raise RuntimeError(f"native generator failed (rc={rc})")
    return out
