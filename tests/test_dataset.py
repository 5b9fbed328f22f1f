r"""Registry-parametrized dataset tests.

Parity with the reference tier (``tests/test_dataset.py:9-29``): build
train+test wrappers, set_seq_len(1,1,1), check split dict shape and one sample
per split against the VPData contract. Data-dependent tests degrade to skips
via PytestExpectedException (``base_dataset.py:97-99`` semantics).
"""
import numpy as np
import pytest

from vp_suite_tpu.datasets import DATASET_CLASSES
from vp_suite_tpu.utils.dataset_wrapper import VPDatasetWrapper
from vp_suite_tpu.utils.utils import PytestExpectedException
from helpers.test_helpers import skip_on

MMF_KWARGS = dict(img_size=32, digit_source="synthetic", n_seqs=8)


def _kwargs_for(dataset_id):
    return dict(MMF_KWARGS) if dataset_id == "MMF" else {}


@pytest.mark.parametrize("dataset_id", list(DATASET_CLASSES.keys()))
@skip_on((PytestExpectedException, FileNotFoundError), "dataset files unavailable")
def test_dataset_contract(dataset_id):
    kwargs = _kwargs_for(dataset_id)
    train_wrapper = VPDatasetWrapper(dataset_id, "train", **kwargs)
    test_wrapper = VPDatasetWrapper(dataset_id, "test", **kwargs)
    for wrapper in [train_wrapper, test_wrapper]:
        wrapper.set_seq_len(1, 1, 1)
        assert wrapper.is_ready()
    assert set(train_wrapper.datasets.keys()) == {"main", "train", "val"}
    assert set(test_wrapper.datasets.keys()) == {"main", "test"}
    assert train_wrapper.img_shape == test_wrapper.img_shape
    assert train_wrapper.action_size == test_wrapper.action_size

    for data in [train_wrapper.train_data[0], train_wrapper.val_data[0],
                 test_wrapper.test_data[0]]:
        frames = np.asarray(data["frames"])
        actions = np.asarray(data["actions"])
        c, h, w = train_wrapper.img_shape
        assert frames.shape == (2, h, w, c)  # total_frames=2 (1 ctx + 1 pred), THWC
        assert frames.dtype == np.float32
        assert actions.shape[0] == 2
        assert "origin" in data


def test_mmf_split_rngs_differ():
    r"""Split seed offsets must yield different data per split
    (parity: ``mmnist_on_the_fly.py:30``)."""
    from vp_suite_tpu.datasets import MovingMNISTOnTheFly
    seqs = {}
    for split in ["train", "val", "test"]:
        ds = MovingMNISTOnTheFly(split, **MMF_KWARGS)
        ds.set_seq_len(1, 1, 1)
        seqs[split] = np.asarray(ds[0]["frames"])
    assert not np.allclose(seqs["train"], seqs["val"])
    assert not np.allclose(seqs["val"], seqs["test"])


def test_mmf_value_range_scaling():
    from vp_suite_tpu.datasets import MovingMNISTOnTheFly
    ds = MovingMNISTOnTheFly("test", value_range_min=-1.0, value_range_max=1.0,
                             **MMF_KWARGS)
    ds.set_seq_len(2, 2, 1)
    frames = np.asarray(ds[0]["frames"])
    assert frames.min() >= -1.0 and frames.max() <= 1.0
    assert frames.min() < -0.5  # black background maps to -1


def test_seq_len_negotiation_rejects_too_long():
    from vp_suite_tpu.datasets import KTHActionsDataset

    class FakeKTH(KTHActionsDataset):
        def __init__(self):  # bypass file loading
            self.split = "train"
            self.ready_for_usage = False
    ds = FakeKTH()
    with pytest.raises(ValueError):
        ds.set_seq_len(20, 20, 2)  # (40-1)*2+1 = 79 > MIN_SEQ_LEN 30


def test_preprocess_postprocess_roundtrip():
    from vp_suite_tpu.datasets import MovingMNISTOnTheFly
    ds = MovingMNISTOnTheFly("test", **MMF_KWARGS)
    ds.set_seq_len(1, 1, 1)
    raw = (np.random.default_rng(0).random((2, 32, 32, 3)) * 255).astype(np.uint8)
    pre = ds.preprocess(raw)
    post = ds.postprocess(pre)
    assert post.dtype == np.uint8
    assert np.abs(post.astype(int) - raw.astype(int)).max() <= 1


def test_preprocess_dtype_matrix():
    r"""Dtype contract parity (reference ``base_dataset.py:236-242``):
    uint8 /255, uint16 /65535, float64 /255, float32 rejected."""
    from vp_suite_tpu.datasets import MovingMNISTOnTheFly
    ds = MovingMNISTOnTheFly("test", **MMF_KWARGS)
    ds.set_seq_len(1, 1, 1)
    base = np.full((1, 32, 32, 3), 51, dtype=np.float64)

    out8 = ds.preprocess(base.astype(np.uint8), transform=False)
    assert out8.dtype == np.float32 and np.allclose(out8, 51 / 255.0)

    out16 = ds.preprocess((base * 257).astype(np.uint16), transform=False)
    assert np.allclose(out16, 51 * 257 / 65535.0)

    out64 = ds.preprocess(base, transform=False)
    assert out64.dtype == np.float32 and np.allclose(out64, 51 / 255.0, atol=1e-6)

    with pytest.raises(ValueError):
        ds.preprocess(base.astype(np.float32), transform=False)
    with pytest.raises(ValueError):
        ds.preprocess(base.astype(np.int32), transform=False)


def test_add_borders_colorizes_grayscale():
    r"""c=1 sequences must get green context / red prediction borders
    (reference ``visualization.py:17-79`` colorizes before bordering)."""
    from vp_suite_tpu.utils.visualization import add_borders, COLORS
    seq = np.zeros((4, 8, 8, 1), dtype=np.uint8)
    out = add_borders(seq, context_frames=2, border=2)
    assert out.shape == (4, 12, 12, 3)
    assert tuple(out[0, 0, 0]) == COLORS["green"]
    assert tuple(out[3, 0, 0]) == COLORS["red"]
    assert (out[0, 2:-2, 2:-2] == 0).all()
