r"""Device-resident Moving-MNIST synthesis (``datasets/mmnist_device.py``).

The 'device' backend replaces the host generator in ``VPSuite.train``; these
tests pin its physics to the numpy reference algorithm
(``mmnist_on_the_fly.py:133-147`` parity), its determinism, and its facade
integration.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vp_suite_tpu.datasets.mmnist_device import (
    generate_batch, _simulate, _sample_speed, DeviceBatchIterator)


def _numpy_move(speed, pos, img_size, digit_size):
    nxt = pos + speed
    for i, p in enumerate(nxt):
        if p + digit_size > img_size:
            nxt[i] = p - (p + digit_size - img_size)
            speed[i] = -speed[i]
        elif p < 0:
            nxt[i] = -p
            speed[i] = -speed[i]
    # post-mirror clamp, matching mmnist_on_the_fly._move_digit (a mirror
    # can overshoot the other edge when img - digit < |speed|)
    np.clip(nxt, 0, img_size - digit_size, out=nxt)
    return speed, nxt


import pytest


@pytest.mark.parametrize("img_size,digit_size", [
    (64, 28),   # reference geometry (free range >> speed; clamp is a no-op)
    (32, 28),   # tight geometry: free range 4 < max speed 5 — the clamp
                # path MUST fire and all backends must agree
])
def test_physics_matches_numpy_reference_algorithm(img_size, digit_size):
    kp, ks = jax.random.split(jax.random.PRNGKey(7))
    b, d, t, s, ds = 3, 2, 25, img_size, digit_size
    traj = np.asarray(_simulate(kp, ks, b, d, t, s, ds, 2, 5))
    p0 = np.asarray(jax.random.randint(kp, (b, d, 2), 0, s - ds))
    s0 = np.asarray(_sample_speed(ks, (b, d, 2), 2, 5))
    for bi in range(b):
        for di in range(d):
            pos, speed = p0[bi, di].copy(), s0[bi, di].copy()
            for ti in range(t):
                speed, pos = _numpy_move(speed, pos, s, ds)
                assert np.array_equal(pos, traj[ti, bi, di])
    assert (traj >= 0).all() and (traj <= s - ds).all()


def test_speed_distribution_support():
    v = np.asarray(_sample_speed(jax.random.PRNGKey(0), (4000,), 2, 5))
    assert set(np.unique(np.abs(v))) == {2, 3, 4, 5}
    assert (v < 0).any() and (v > 0).any()
    v0 = np.asarray(_sample_speed(jax.random.PRNGKey(1), (4000,), 0, 2))
    assert set(np.unique(v0)) == {-2, -1, 0, 1, 2}


def _gen(key, **over):
    templates = np.zeros((10, 8, 8), np.float32)
    templates[:, 2:6, 2:6] = 0.8
    kw = dict(batch=4, seq_len=6, img_size=16, num_channels=3, num_digits=2,
              min_speed=2, max_speed=5)
    kw.update(over)
    return generate_batch(key, jnp.asarray(templates), **kw)


def test_generate_batch_contract():
    f = np.asarray(_gen(jax.random.PRNGKey(0)))
    assert f.shape == (4, 6, 16, 16, 3)
    assert f.dtype == np.float32
    assert f.min() >= 0.0 and f.max() <= 1.0
    # every frame contains digit mass, channels are identical (grayscale x3)
    assert (f.sum(axis=(2, 3, 4)) > 0).all()
    assert np.array_equal(f[..., 0], f[..., 1])
    # deterministic in the key
    assert np.array_equal(f, np.asarray(_gen(jax.random.PRNGKey(0))))
    assert not np.array_equal(f, np.asarray(_gen(jax.random.PRNGKey(1))))


def test_generate_batch_value_range():
    f = np.asarray(_gen(jax.random.PRNGKey(0), value_range=(-1.0, 1.0)))
    assert f.min() >= -1.0 and f.max() <= 1.0 and f.min() < 0.0


def test_iterator_yields_batches():
    templates = np.full((10, 8, 8), 200, np.uint8)
    it = DeviceBatchIterator(templates, batch_size=2, seq_len=4, img_size=16,
                             num_channels=1, num_digits=2, min_speed=2,
                             max_speed=5, value_range=(0.0, 1.0), n_steps=3,
                             seed=0)
    batches = list(it)
    assert len(batches) == len(it) == 3
    for b in batches:
        assert b["frames"].shape == (2, 4, 16, 16, 1)
        assert b["actions"].shape == (2, 4, 1)
    # distinct batches (per-step key splits)
    assert not np.array_equal(np.asarray(batches[0]["frames"]),
                              np.asarray(batches[1]["frames"]))


def test_dataset_exposes_device_iterator():
    from vp_suite_tpu.datasets.mmnist_on_the_fly import MovingMNISTOnTheFly
    ds = MovingMNISTOnTheFly("train", img_size=16, digit_source="synthetic",
                             backend="device", n_seqs=8)
    ds.set_seq_len(2, 2, 1)
    it = ds.device_batch_iterator(4, 2, seed=0)
    batches = list(it)
    assert len(batches) == 2
    assert batches[0]["frames"].shape == (4, 4, 16, 16, 3)
    # __getitem__ still works (numpy fallback for val/vis/test)
    item = ds[0]
    assert np.asarray(item["frames"]).shape == (4, 16, 16, 3)


@pytest.mark.parametrize("n_dev", [
    1, pytest.param(8, marks=pytest.mark.slow)])  # 8-way: ~min/step on the
# 1-core host's emulated mesh — integration tier only
def test_facade_train_with_device_backend(tmp_path, n_dev):
    if n_dev > 1 and len(jax.devices()) < n_dev:
        pytest.skip("needs 8 (virtual) devices")
    from vp_suite_tpu import VPSuite
    suite = VPSuite(device="cpu")
    suite.load_dataset("MMF", img_size=16, digit_source="synthetic",
                       backend="device", n_seqs=8)
    suite.create_model("convlstm-shi")
    suite.train(epochs=1, batch_size=n_dev, context_frames=2, pred_frames=2,
                steps_per_epoch=1, no_vis=True, no_wandb=True,
                num_devices=n_dev, out_dir=str(tmp_path))
    assert (tmp_path / "best_model").exists()
