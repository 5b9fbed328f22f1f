r"""Device-resident Moving-MNIST batch synthesis (TPU-side data generation).

The reference feeds Moving-MNIST through a 4-worker torch DataLoader
(``vp_suite/vpsuite.py:296-298``); on this 1-core host the numpy generator
caps ``VPSuite.train`` at ~700 frames/s while the chip consumes 5000+. This
module removes the host from the hot path entirely: digit templates are
uploaded to HBM ONCE, and every training batch is synthesised on the device
inside a jitted function whose only input is a PRNG key.

TPU-first design:
- Bounce physics (parity with ``mmnist_on_the_fly.py:133-147``: clamp at the
  far wall, mirror at the near wall, speed negation) run as a tiny
  ``lax.scan`` over time on int32 position/speed state — [b, d, 2] lanes,
  microseconds of VPU work.
- Compositing avoids gathers/scatters (serialization-bound on TPU, see
  ``ops/grid_sample.py``): placing digit ``D`` at integer position (y, x) is
  the separable one-hot product ``frame = R D C^T`` with
  ``R[y, i] = [y == pos_y + i]``, ``C[x, j] = [x == pos_x + j]`` — built with
  iota comparisons and contracted as ONE batched einsum over the whole
  [T, b, d] volume (MXU work, ~no HBM pressure).
- Digit-template selection is the only gather: b*d rows out of the template
  bank, negligible.

The RNG stream is jax-native (``jax.random``), NOT the reference's numpy
stream — same physics and marginal distributions, different samples. The
``numpy`` backend remains the reference-parity path; this one is the
throughput path (selected via ``MovingMNISTOnTheFly(backend="device")``).
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _sample_speed(key, shape, min_speed, max_speed):
    r"""Uniform over {±min..±max} (the reference's rejection loop
    ``mmnist_on_the_fly.py:118-125`` conditions a uniform int on
    |v| >= min_speed, which is exactly this set). min_speed == 0 adds 0 with
    the same weight as each signed magnitude pair's elements."""
    if min_speed <= 0:
        # uniform over {-max..max}: the rejection loop accepts everything
        return jax.random.randint(key, shape, -max_speed, max_speed + 1)
    n_mag = max_speed - min_speed + 1
    r = jax.random.randint(key, shape, 0, 2 * n_mag)
    mag = min_speed + (r % n_mag)
    sign = jnp.where(r < n_mag, 1, -1)
    return sign * mag


def _simulate(key_pos, key_speed, batch, num_digits, seq_len, img_size,
              digit_size, min_speed, max_speed):
    r"""Integer bounce trajectories: -> positions [T, b, d, 2] int32."""
    pos0 = jax.random.randint(key_pos, (batch, num_digits, 2), 0,
                              img_size - digit_size)
    speed0 = _sample_speed(key_speed, (batch, num_digits, 2),
                           min_speed, max_speed)

    def step(carry, _):
        pos, speed = carry
        nxt = pos + speed
        hi = nxt + digit_size > img_size          # far wall: clamp (reference
        lo = nxt < 0                              # quirk), near wall: mirror
        nxt = jnp.where(hi, img_size - digit_size, jnp.where(lo, -nxt, nxt))
        # mirroring off the near wall can overshoot the far wall when the
        # free range (img - digit) < |speed| — clamp, matching the numpy
        # path's np.clip (parity test: tests/test_mmnist_device.py)
        nxt = jnp.clip(nxt, 0, img_size - digit_size)
        speed = jnp.where(hi | lo, -speed, speed)
        return (nxt, speed), nxt

    # frame 0 already moves once (reference applies _move_digit before the
    # first composite, mmnist_on_the_fly.py:103-110)
    (_, _), traj = lax.scan(step, (pos0, speed0), None, length=seq_len)
    return traj  # [T, b, d, 2]


@functools.partial(
    jax.jit,
    static_argnames=("batch", "seq_len", "img_size", "num_channels",
                     "num_digits", "min_speed", "max_speed", "value_range"))
def generate_batch(key, templates, *, batch, seq_len, img_size, num_channels,
                   num_digits, min_speed, max_speed,
                   value_range=(0.0, 1.0)):
    r"""One training batch, synthesised entirely on device.

    Args:
        key: PRNG key (the only per-batch input).
        templates: [n, ds, ds] float32 digit bank in [0, 1], device-resident.
    Returns:
        frames [b, T, S, S, c] float32 in ``value_range``.
    """
    ds = templates.shape[-1]
    k_id, k_pos, k_speed = jax.random.split(key, 3)

    ids = jax.random.randint(k_id, (batch, num_digits), 0, templates.shape[0])
    digits = jnp.take(templates, ids, axis=0)            # [b, d, ds, ds]

    traj = _simulate(k_pos, k_speed, batch, num_digits, seq_len, img_size,
                     ds, min_speed, max_speed)           # [T, b, d, 2]

    # separable one-hot placement factors (iota comparison, no gather)
    iota_s = lax.broadcasted_iota(jnp.int32, (img_size, ds), 0)
    iota_d = lax.broadcasted_iota(jnp.int32, (img_size, ds), 1)
    rel = iota_s - iota_d                                # [S, ds]: y - i
    rows = (rel[None, None, None] == traj[..., 0:1, None]).astype(jnp.float32)
    cols = (rel[None, None, None] == traj[..., 1:2, None]).astype(jnp.float32)
    # rows/cols: [T, b, d, S, ds]
    rows = rows.reshape(seq_len, batch, num_digits, img_size, ds)
    cols = cols.reshape(seq_len, batch, num_digits, img_size, ds)

    # frame[t,b,y,x] = sum_d R[t,b,d,y,i] D[b,d,i,j] C[t,b,d,x,j]
    u = jnp.einsum("bdij,tbdxj->tbdxi", digits, cols)
    frames = jnp.einsum("tbdyi,tbdxi->tbyx", rows, u)
    frames = jnp.clip(frames, 0.0, 1.0)

    frames = jnp.moveaxis(frames, 0, 1)                  # [b, T, S, S]
    frames = jnp.broadcast_to(frames[..., None],
                              (*frames.shape, num_channels))
    lo, hi = value_range
    if (lo, hi) != (0.0, 1.0):
        frames = frames * (hi - lo) + lo
    return frames


@functools.lru_cache(maxsize=None)
def _sharded_generator(sharding, cfg_items):
    r"""jit-with-out_shardings wrapper, cached so per-epoch iterator
    re-creation reuses the compiled executable (a fresh ``jax.jit`` object
    would recompile every epoch — measured ~150 s per epoch on the 8-device
    virtual CPU mesh)."""
    cfg = dict(cfg_items)
    return jax.jit(functools.partial(generate_batch.__wrapped__, **cfg),
                   out_shardings=sharding)


class DeviceBatchIterator:
    r"""Iterator yielding ``n_steps`` device-resident batches
    {'frames', 'actions'} from per-step PRNG keys — a drop-in replacement for
    ``BatchLoader`` + ``device_prefetch`` when the dataset is synthesised.

    Dispatches are asynchronous, so consecutive generate/train-step pairs
    pipeline on device with no host sync; the host's only per-step work is
    two jitted-call dispatches.
    """

    def __init__(self, templates_u8, *, batch_size, seq_len, img_size,
                 num_channels, num_digits, min_speed, max_speed,
                 value_range, n_steps, seed, action_size=1, sharding=None):
        templates = np.asarray(templates_u8, dtype=np.float32) / 255.0
        self._templates = jax.device_put(templates)
        self._cfg = dict(batch=batch_size, seq_len=seq_len, img_size=img_size,
                         num_channels=num_channels, num_digits=num_digits,
                         min_speed=min_speed, max_speed=max_speed,
                         value_range=tuple(float(v) for v in value_range))
        self.n_steps = n_steps
        self._key = jax.random.PRNGKey(seed)
        self._gen = generate_batch
        if sharding is not None:
            # generate each batch ALREADY sharded over the data mesh: the
            # computation is batch-parallel, so XLA partitions it across
            # devices with no collective traffic
            self._gen = _sharded_generator(sharding,
                                           tuple(sorted(self._cfg.items())))
            self._cfg = None
        actions = np.zeros((batch_size, seq_len, action_size), np.float32)
        self._actions = jax.device_put(actions, sharding) if sharding is not None \
            else jax.device_put(actions)

    def __len__(self):
        return self.n_steps

    def __iter__(self):
        key = self._key
        for _ in range(self.n_steps):
            key, sub = jax.random.split(key)
            if self._cfg is None:
                frames = self._gen(sub, self._templates)
            else:
                frames = self._gen(sub, self._templates, **self._cfg)
            yield {"frames": frames, "actions": self._actions}
