r"""File-backed dataset loaders exercised against miniature fake datasets.

The reference's dataset tests skip entirely when data is absent
(``tests/test_dataset.py`` + PytestExpectedException); this tier goes further:
it synthesizes tiny on-disk datasets in the exact storage formats each loader
expects, so windowing/split/action logic actually runs in CI.
"""
import json
from pathlib import Path

import numpy as np
import pytest


def _write_png(fp, h=32, w=32, seed=0):
    import cv2
    img = (np.random.default_rng(seed).random((h, w, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(fp), img)


def _write_mp4(fp, frames=30, h=32, w=32, seed=0):
    import cv2
    vw = cv2.VideoWriter(str(fp), cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    rng = np.random.default_rng(seed)
    for _ in range(frames):
        vw.write((rng.random((h, w, 3)) * 255).astype(np.uint8))
    vw.release()


# --------------------------------------------------------------------------- #
def test_moving_mnist_stored(tmp_path):
    r"""Generate a mini stored MM dataset with our generator, then load it."""
    from vp_suite_tpu.datasets.mmnist import MovingMNISTDataset, generate_moving_mnist
    for split, n in [("train", 6), ("test", 3)]:
        out = tmp_path / split
        out.mkdir(parents=True)
        generate_moving_mnist(tmp_path, out, training=(split == "train"),
                              shape=(64, 64), num_frames=8, num_images=n,
                              digit_size=28, digits_per_image=2, seed=42)
    ds = MovingMNISTDataset("train", data_dir=str(tmp_path))
    ds.set_seq_len(2, 3, 1)
    d = ds[0]
    assert d["frames"].shape == (5, 64, 64, 3)
    assert len(ds) == 6
    assert d["frames"].max() > 0.1


def test_bair(tmp_path):
    from vp_suite_tpu.datasets.bair import BAIRPushingDataset
    rng = np.random.default_rng(0)
    for split, n in [("train", 4), ("test", 2)]:
        d = tmp_path / "softmotion30_44k" / split
        d.mkdir(parents=True)
        for i in range(n):
            np.save(d / f"seq_{i:05d}_obs.npy",
                    (rng.random((30, 64, 64, 3)) * 255).astype(np.uint8))
            np.save(d / f"seq_{i:05d}_actions.npy",
                    rng.random((30, 4)).astype(np.float32))
    ds = BAIRPushingDataset("train", data_dir=str(tmp_path))
    ds.set_seq_len(3, 4, 1)
    d = ds[0]
    assert d["frames"].shape == (7, 64, 64, 3)
    assert d["actions"].shape == (7, 4)
    assert len(ds) == 4


def test_kth(tmp_path):
    from vp_suite_tpu.datasets.kth import KTHActionsDataset, build_kth_metadata
    processed = tmp_path / "processed"
    rng_seed = 0
    for c in KTHActionsDataset.CLASSES:
        for person, split_frames in [("person01", 35), ("person22", 35)]:
            vid_dir = processed / c / f"{person}_{c}_d1"
            vid_dir.mkdir(parents=True)
            for f in range(split_frames):
                _write_png(vid_dir / f"image-{f:03d}_64x64.png", 64, 64, rng_seed)
                rng_seed += 1
    build_kth_metadata(processed, KTHActionsDataset.CLASSES)
    for split in ["train", "test"]:
        ds = KTHActionsDataset(split, data_dir=str(tmp_path))
        ds.set_seq_len(2, 3, 1)
        d = ds[0]
        assert d["frames"].shape == (5, 64, 64, 3)
        assert len(ds) > 0


def test_kitti_raw(tmp_path):
    from vp_suite_tpu.datasets.kitti_raw import KITTIRawDataset
    for date_i in range(2):
        for drive_i in range(3):
            data_dir = (tmp_path / f"2011_09_{26+date_i}"
                        / f"2011_09_{26+date_i}_drive_{drive_i:04d}_sync"
                        / "image_02" / "data")
            data_dir.mkdir(parents=True)
            for f in range(12):
                _write_png(data_dir / f"{f:010d}.png", 24, 48, f)
    ds = KITTIRawDataset("train", data_dir=str(tmp_path), img_size=(24, 48))
    ds.set_seq_len(2, 2, 1)
    d = ds[0]
    assert d["frames"].shape == (4, 24, 48, 3)
    assert len(ds) > 0
    # test split uses different drives than train
    ds_test = KITTIRawDataset("test", data_dir=str(tmp_path), img_size=(24, 48))
    ds_test.set_seq_len(2, 2, 1)
    assert len(ds_test) > 0


def test_synpick(tmp_path):
    from vp_suite_tpu.datasets.synpick import SynpickMovingDataset
    rgb = tmp_path / "processed" / "train" / "rgb"
    gt = tmp_path / "processed" / "train" / "scene_gt"
    rgb.mkdir(parents=True)
    gt.mkdir(parents=True)
    n_frames = 90
    ep = 0
    rng = np.random.default_rng(0)
    gt_dict = {}
    pos = np.array([0.0, 0.0, 0.0])
    for f in range(n_frames):
        _write_png(rgb / f"{ep:06d}_{f:06d}.png", 34, 60, f)  # ep/frame id layout
        pos = pos + rng.uniform(2, 8, 3)  # gripper keeps moving
        gt_dict[str(f)] = [{"cam_t_m2c": pos.tolist()}]
    with open(gt / f"{ep:06d}_scene_gt.json", "w") as fp:
        json.dump(gt_dict, fp)
    ds = SynpickMovingDataset("train", data_dir=str(tmp_path), img_size=(34, 60))
    ds.set_seq_len(2, 2, 1)
    assert len(ds) > 0
    d = ds[0]
    assert d["frames"].shape == (4, 34, 60, 3)
    assert d["actions"].shape == (3, 3)  # T-1 gripper deltas


def test_physics101(tmp_path):
    from vp_suite_tpu.datasets.physics101 import Physics101Dataset
    for i in range(5):
        d = tmp_path / f"scenario_{i}" / "obj"
        d.mkdir(parents=True)
        _write_mp4(d / "Kinect_RGB_1.mp4", frames=20, h=32, w=32, seed=i)
    ds = Physics101Dataset("train", data_dir=str(tmp_path), img_size=(32, 32))
    ds.set_seq_len(2, 2, 1)
    d = ds[0]
    assert d["frames"].shape == (4, 32, 32, 3)
    ds_test = Physics101Dataset("test", data_dir=str(tmp_path), img_size=(32, 32))
    assert len(ds) + len(ds_test) == 5


def test_human36m(tmp_path):
    from vp_suite_tpu.datasets.human36m import Human36MDataset
    counts = {}
    for split_ing, n_vids in [("training", 3), ("testing", 2)]:
        d = tmp_path / split_ing / "Videos"
        d.mkdir(parents=True)
        for i in range(n_vids):
            fp = d / f"Walking {i}.mp4"
            _write_mp4(fp, frames=40, h=32, w=32, seed=i)
            counts[str(fp.resolve())] = 40
        with open(tmp_path / split_ing / "frame_counts.json", "w") as f:
            json.dump({k: v for k, v in counts.items() if split_ing in k}, f)
    ds = Human36MDataset("train", data_dir=str(tmp_path), img_size=(32, 32),
                         scenarios=["Walking"])
    ds.set_seq_len(2, 2, 1)
    d = ds[0]
    assert d["frames"].shape == (4, 32, 32, 3)
    assert len(ds) > 0
