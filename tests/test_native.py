r"""Native input-pipeline core tests (C generator, compile-on-demand)."""
import numpy as np
import pytest

from vp_suite_tpu.native import native_available


@pytest.mark.skipif(not native_available(), reason="no C compiler available")
def test_native_generator_contract():
    from vp_suite_tpu.datasets import MovingMNISTOnTheFly
    ds = MovingMNISTOnTheFly("train", img_size=32, digit_source="synthetic",
                             backend="native", n_seqs=16)
    ds.set_seq_len(2, 3, 1)
    d = ds[0]
    frames = np.asarray(d["frames"])
    assert frames.shape == (5, 32, 32, 3)
    assert frames.dtype == np.float32
    assert 0.0 <= frames.min() and frames.max() <= 1.0
    assert frames.max() > 0.1  # digits actually drawn


@pytest.mark.skipif(not native_available(), reason="no C compiler available")
def test_native_generator_index_deterministic():
    from vp_suite_tpu.datasets import MovingMNISTOnTheFly
    ds = MovingMNISTOnTheFly("train", img_size=32, digit_source="synthetic",
                             backend="native", n_seqs=16)
    ds.set_seq_len(2, 2, 1)
    a = np.asarray(ds[7]["frames"])
    b = np.asarray(ds[3]["frames"])
    c = np.asarray(ds[7]["frames"])  # out-of-order re-read
    assert np.allclose(a, c)
    assert not np.allclose(a, b)


@pytest.mark.skipif(not native_available(), reason="no C compiler available")
def test_native_splits_differ():
    from vp_suite_tpu.datasets import MovingMNISTOnTheFly
    seqs = {}
    for split in ["train", "val", "test"]:
        ds = MovingMNISTOnTheFly(split, img_size=32, digit_source="synthetic",
                                 backend="native", n_seqs=8)
        ds.set_seq_len(1, 1, 1)
        seqs[split] = np.asarray(ds[0]["frames"])
    assert not np.allclose(seqs["train"], seqs["val"])
    assert not np.allclose(seqs["val"], seqs["test"])
