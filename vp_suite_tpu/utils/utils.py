r"""Core utilities.

TPU-native analog of the reference utility layer (``vp_suite/utils/utils.py``):
same capability surface (kwargs-to-attribute config system, reflection-based
config export, video IO, download helpers, timed input), re-implemented for
this framework. RNG helpers use ``np.random.default_rng`` / ``jax.random``.
"""
import json
import signal
import subprocess
import sys
import urllib.request
from datetime import datetime
from pathlib import Path

import numpy as np


class PytestExpectedException(Exception):
    r"""Raised instead of downloading datasets when running under pytest
    (reference behaviour: ``vp_suite/utils/utils.py:274-278``)."""
    pass


def most(lst, factor=0.67):
    r"""True iff at least ``factor`` of the entries of ``lst`` are truthy
    (reference: ``vp_suite/utils/utils.py:15-25``)."""
    lst = list(lst)
    if len(lst) == 0:
        return False
    return sum(1 for x in lst if x) >= factor * len(lst)


def timestamp(program: str = "") -> str:
    r"""Returns a timestamp string usable as a directory name."""
    stamp = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    return f"{program}_{stamp}" if program else stamp


def run_shell_command(command: str):
    r"""Runs a shell command, raising on failure."""
    subprocess.run(command, shell=True, check=True)


def set_from_kwarg(obj, kwarg_dict: dict, attr_name: str, default=None, required: bool = False,
                   choices=None, skip_unusable: bool = False):
    r"""Typed attribute setter used by the kwargs-based component config system
    (reference semantics: ``vp_suite/utils/utils.py:113-156``).

    Sets ``obj.<attr_name>`` from ``kwarg_dict`` if present; type-checks against
    an existing attribute value and validates against ``choices``.
    """
    attr_val = kwarg_dict.get(attr_name, default)
    if attr_name not in kwarg_dict:
        if required:
            raise ValueError(f"missing required argument: '{attr_name}'")
        if default is None:
            return
    # type check against existing default, if any
    if hasattr(obj, attr_name):
        cur = getattr(obj, attr_name)
        if cur is not None and attr_val is not None and not isinstance(cur, type(NotImplemented)):
            cur_t, new_t = type(cur), type(attr_val)
            compatible = (cur_t == new_t
                          or (cur_t in (list, tuple) and new_t in (list, tuple))
                          or (cur_t in (int, float) and new_t in (int, float)))
            if not compatible:
                if skip_unusable:
                    return
                raise TypeError(f"mismatching types for argument '{attr_name}' "
                                f"(expected: {cur_t}, got: {new_t})")
    elif skip_unusable:
        return
    if choices is not None:
        vals = attr_val if isinstance(attr_val, (list, tuple)) else [attr_val]
        for v in vals:
            if v not in choices:
                raise ValueError(f"invalid value for argument '{attr_name}': {v} "
                                 f"(valid choices: {choices})")
    setattr(obj, attr_name, attr_val)


def get_public_attrs(obj, calling_method: str = None, non_config_vars=None, model_mode: bool = False) -> dict:
    r"""Reflects an object's public, non-constant, non-callable attributes into
    a flat dict (reference semantics: ``vp_suite/utils/utils.py:208-234``).

    Skips dunder/private attributes, ALL-CAPS constants, properties named
    ``calling_method`` (to avoid recursion), callables, and ``non_config_vars``.
    """
    non_config_vars = set(non_config_vars or [])
    attrs = {}
    cls = type(obj)
    names = set()
    for klass in cls.__mro__:
        names.update(vars(klass).keys())
    names.update(vars(obj).keys() if hasattr(obj, "__dict__") else [])
    for name in sorted(names):
        if name.startswith("_") or name == calling_method or name in non_config_vars:
            continue
        if name.isupper():  # constants
            continue
        cls_attr = getattr(cls, name, None)
        if isinstance(cls_attr, property):
            continue
        try:
            val = getattr(obj, name)
        except Exception:
            continue
        if callable(val):
            continue
        if model_mode and hasattr(val, "shape"):  # skip arrays/params in model mode
            continue
        attrs[name] = val
    return attrs


def read_video(fp, img_size=None, start_index=0, num_frames=-1):
    r"""Reads video frames with OpenCV into a uint8 array [t, h, w, c] (RGB).

    Reference semantics: ``vp_suite/utils/utils.py:159-205``.
    """
    import cv2
    cap = cv2.VideoCapture(str(fp))
    if not cap.isOpened():
        raise ValueError(f"Could not open video file: {fp}")
    cap.set(cv2.CAP_PROP_POS_FRAMES, start_index)
    collected = []
    while num_frames < 0 or len(collected) < num_frames:
        ret, frame = cap.read()
        if not ret:
            break
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if img_size is not None:
            h, w = (img_size, img_size) if isinstance(img_size, int) else img_size
            frame = cv2.resize(frame, (w, h))
        collected.append(frame)
    cap.release()
    if num_frames > 0 and len(collected) < num_frames:
        raise ValueError(f"Video '{fp}' too short: wanted {num_frames} frames from index "
                         f"{start_index}, got {len(collected)}")
    return np.stack(collected, axis=0)


def get_frame_count(fp) -> int:
    r"""Number of frames in a video file (may be unreliable for some codecs)."""
    import cv2
    cap = cv2.VideoCapture(str(fp))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n


def download_from_url(url: str, dst_path):
    r"""Downloads a file with a progress display. Raises in sandboxed (no
    egress) environments; callers should catch and degrade gracefully."""
    dst_path = Path(dst_path)
    dst_path.parent.mkdir(parents=True, exist_ok=True)
    print(f"downloading {url} -> {dst_path}")
    urllib.request.urlretrieve(url, dst_path)


def timed_input(prompt: str, default=None, secs: int = 60):
    r"""Prompts for input, falling back to ``default`` after ``secs`` seconds
    (reference: ``vp_suite/utils/utils.py:237-271``). In non-interactive
    sessions the default is returned immediately."""
    if not sys.stdin.isatty():
        return default

    def _timeout(signum, frame):
        raise TimeoutError

    old = signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(secs)
    try:
        result = input(f"{prompt} (default: {default}, {secs}s timeout): ").strip()
        return result if result else default
    except TimeoutError:
        print(f"\n... timed out, using default: {default}")
        return default
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def check_optuna_config(optuna_cfg: dict):
    r"""Validates a hyperopt search-space config
    (reference semantics: ``vp_suite/utils/utils.py:88-110``).

    Each entry maps a run-config parameter to either
    ``{"choices": [...]}`` or ``{"min": x, "max": y, ["log": bool], ["type": "int"|"float"]}``.
    """
    if not isinstance(optuna_cfg, dict):
        raise ValueError("hyperopt config must be a dict")
    for param, spec in optuna_cfg.items():
        if not isinstance(spec, dict):
            raise ValueError(f"hyperopt config entry '{param}' must be a dict")
        if "choices" in spec:
            if not isinstance(spec["choices"], list) or len(spec["choices"]) == 0:
                raise ValueError(f"hyperopt config entry '{param}': 'choices' must be a non-empty list")
        else:
            if "min" not in spec or "max" not in spec:
                raise ValueError(f"hyperopt config entry '{param}' needs 'min' and 'max' (or 'choices')")
            if spec["min"] > spec["max"]:
                raise ValueError(f"hyperopt config entry '{param}': min > max")


def seeded_shuffle_split(items, ratio, seed, at_least_one=False):
    r"""Deterministically shuffles a copy of ``items`` and cuts it in two.

    The cut point is ``int(len * ratio)`` (optionally floored at 1), applied
    AFTER a ``random.Random(seed)`` shuffle — the split-membership convention
    shared by the path-globbing datasets (reference: ``kitti_raw.py:52-63``,
    ``physics101.py:45-50``).

    Returns: (first_part, second_part).
    """
    import random
    pool = list(items)
    random.Random(seed).shuffle(pool)
    cut = int(len(pool) * ratio)
    if at_least_one:
        cut = max(1, cut)
    return pool[:cut], pool[cut:]


def save_json(obj, fp):
    fp = Path(fp)
    fp.parent.mkdir(parents=True, exist_ok=True)
    with open(fp, "w") as f:
        json.dump(obj, f, indent=2, default=str)



def enable_compilation_cache(cache_dir=None):
    r"""Enables JAX's persistent compilation cache (huge win on backends with
    slow remote compilation: process restarts reuse compiled executables).
    Safe to call multiple times; returns the cache dir or None on failure."""
    import jax
    from vp_suite_tpu.defaults import SETTINGS
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "cpu"
    if backend == "cpu":
        # XLA:CPU caches AOT-compiled machine code keyed WITHOUT the host's
        # CPU feature set; loading an entry produced on a different machine
        # warns about feature mismatch and can SIGILL (observed: crash inside
        # AllGatherThunk from a stale cache entry). CPU compiles are fast
        # anyway — only cache for accelerator backends.
        return None
    cache_dir = str(cache_dir or (SETTINGS.RUN_PATH / "jax_cache"))
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:
        return None
