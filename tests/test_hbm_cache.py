r"""HBM-cached training-set loader (device-resident file-backed data).

The reference streams every epoch through a 4-worker torch DataLoader
(``vp_suite/vpsuite.py:296-298``); ``HBMCachedLoader`` stages a small
dataset into device memory once and batches by jitted device-side gather.
These tests pin: content equivalence with the host loader's uint8 path,
per-epoch shuffle determinism, budget estimation, sharded placement, and
facade integration on a file-backed fixture.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vp_suite_tpu.training.data import (BatchLoader, HBMCachedLoader,
                                        estimate_cache_bytes)


class _ToyDataset:
    r"""n items; item i's frames are the constant i/255 so the uint8-cached
    value identifies the item exactly."""

    def __init__(self, n=8, t=3, hw=8, c=3, action_size=2):
        self.n, self.t, self.hw, self.c = n, t, hw, c
        self.action_size = action_size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "frames": np.full((self.t, self.hw, self.hw, self.c), i / 255.0,
                              np.float32),
            "actions": np.full((self.t, self.action_size), float(i), np.float32),
            "origin": f"item{i}",
        }


def test_cache_serves_every_item_once_per_epoch():
    ds = _ToyDataset(n=8)
    cache = HBMCachedLoader(ds, batch_size=4, uint8_frames=True)
    assert len(cache) == 2
    seen = []
    for batch in cache.epoch_iterator(seed=0):
        frames = np.asarray(batch["frames"])
        actions = np.asarray(batch["actions"])
        assert frames.dtype == np.uint8
        assert frames.shape == (4, ds.t, ds.hw, ds.hw, ds.c)
        ids = frames[:, 0, 0, 0, 0].astype(np.int64)
        np.testing.assert_array_equal(actions[:, 0, 0].astype(np.int64), ids)
        seen.extend(ids.tolist())
    assert sorted(seen) == list(range(8))


def test_cache_matches_batchloader_quantization():
    r"""The cached uint8 frames must equal BatchLoader(uint8_frames=True)'s
    stacking byte for byte (same dequantize-on-device contract)."""
    rng = np.random.default_rng(0)

    class _R(_ToyDataset):
        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {"frames": r.random((self.t, self.hw, self.hw, self.c))
                    .astype(np.float32),
                    "actions": np.zeros((self.t, 2), np.float32),
                    "origin": ""}

    ds = _R(n=4)
    host = next(iter(BatchLoader(ds, 4, shuffle=False, uint8_frames=True)))
    cache = HBMCachedLoader(ds, 4, uint8_frames=True)
    (batch,) = list(cache.epoch_iterator(seed=0, shuffle=False))
    np.testing.assert_array_equal(np.asarray(batch["frames"]), host["frames"])


def test_epoch_shuffle_determinism():
    ds = _ToyDataset(n=8)
    cache = HBMCachedLoader(ds, batch_size=4)

    def order(seed):
        out = []
        for b in cache.epoch_iterator(seed=seed):
            out.extend(np.asarray(b["frames"])[:, 0, 0, 0, 0].tolist())
        return out

    assert order(7) == order(7)
    assert order(7) != order(8)


def test_estimate_cache_bytes():
    ds = _ToyDataset(n=8, t=3, hw=8, c=3, action_size=2)
    per_item_u8 = 3 * 8 * 8 * 3 + 3 * 2 * 4
    assert estimate_cache_bytes(ds, uint8_frames=True) == 8 * per_item_u8
    per_item_f32 = 3 * 8 * 8 * 3 * 4 + 3 * 2 * 4
    assert estimate_cache_bytes(ds, uint8_frames=False) == 8 * per_item_f32


def test_sharded_cache_yields_batch_sharded_arrays():
    r"""With a data mesh, the cache is replicated and every gathered batch
    lands already sharded over the data axis."""
    from vp_suite_tpu.parallel.mesh import make_mesh, batch_sharding
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = make_mesh(8)
    sharding = batch_sharding(mesh)
    ds = _ToyDataset(n=16)
    cache = HBMCachedLoader(ds, batch_size=8, sharding=sharding)
    batch = next(iter(cache.epoch_iterator(seed=0)))
    f = batch["frames"]
    assert f.sharding.is_equivalent_to(sharding, f.ndim)
    assert f.addressable_shards[0].data.shape[0] == 1  # 8-way batch split


def test_facade_trains_through_hbm_cache(tmp_path, capsys):
    r"""File-backed stored Moving-MNIST driven through VPSuite.train with the
    cache on: the staging message appears and training converges on finite
    loss; hbm_cache='off' on the same data takes the host-loader path."""
    from vp_suite_tpu import VPSuite
    from vp_suite_tpu.datasets.mmnist import generate_moving_mnist

    for split, n in [("train", 8), ("test", 2)]:
        out = tmp_path / split
        out.mkdir(parents=True)
        generate_moving_mnist(tmp_path, out, training=(split == "train"),
                              shape=(32, 32), num_frames=6, num_images=n,
                              digit_size=20, digits_per_image=1, seed=1)

    suite = VPSuite(device="cpu")
    suite.load_dataset("MM", data_dir=str(tmp_path), img_size=(32, 32))
    suite.create_model("convlstm-shi")
    best = suite.train(epochs=2, batch_size=2, context_frames=2, pred_frames=2,
                       steps_per_epoch=2, no_vis=True, no_wandb=True,
                       out_dir=str(tmp_path / "run"))
    assert np.isfinite(best)
    assert "staged training set into device memory" in capsys.readouterr().out

    best_off = suite.train(epochs=1, batch_size=2, context_frames=2,
                           pred_frames=2, steps_per_epoch=1, no_vis=True,
                           no_wandb=True, hbm_cache="off",
                           out_dir=str(tmp_path / "run_off"))
    assert np.isfinite(best_off)
    assert "staged training set" not in capsys.readouterr().out


def test_facade_hbm_cache_on_budget_error(tmp_path):
    from vp_suite_tpu import VPSuite
    from vp_suite_tpu.datasets.mmnist import generate_moving_mnist

    for split, n in [("train", 4), ("test", 2)]:
        out = tmp_path / split
        out.mkdir(parents=True)
        generate_moving_mnist(tmp_path, out, training=(split == "train"),
                              shape=(32, 32), num_frames=6, num_images=n,
                              digit_size=20, digits_per_image=1, seed=1)
    suite = VPSuite(device="cpu")
    suite.load_dataset("MM", data_dir=str(tmp_path), img_size=(32, 32))
    suite.create_model("convlstm-shi")
    with pytest.raises(ValueError, match="hbm_cache='on'"):
        suite.train(epochs=1, batch_size=2, context_frames=2, pred_frames=2,
                    steps_per_epoch=1, no_vis=True, no_wandb=True,
                    hbm_cache="on", hbm_cache_mb=0,
                    out_dir=str(tmp_path / "run"))
