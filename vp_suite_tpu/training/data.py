r"""Host-side input pipeline: threaded batch assembly + device prefetch.

TPU-native replacement for the reference's 4-worker torch DataLoader
(``vp_suite/vpsuite.py:296-298``): a thread-pool fetches dataset items in
parallel (numpy/cv2 release the GIL), batches are stacked on host, and a
prefetcher keeps ``prefetch`` batches in flight to the device so the TPU never
waits on input (double buffering host->HBM).
"""
import collections
import concurrent.futures as cf
import functools as _functools

import numpy as np


class BatchLoader:
    r"""Iterable over stacked numpy batches: {'frames': [b,t,h,w,c],
    'actions': [b,t,a]}.

    ``uint8_frames``: quantize [0,1]-range frames to uint8 for the host->device
    transfer (4x less PCIe/tunnel traffic; they are dequantized on device by
    the train step). Rounding error <= 1/510 — all source datasets are
    uint8/uint16-backed, so this loses essentially nothing.
    """

    def __init__(self, dataset, batch_size, shuffle=False, seed=0, num_workers=4,
                 drop_last=False, uint8_frames=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.uint8_frames = uint8_frames

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def _stack(self, items):
        frames = np.stack([np.asarray(it["frames"]) for it in items], axis=0)
        if self.uint8_frames and frames.dtype != np.uint8:
            frames = np.clip(np.rint(frames * 255.0), 0, 255).astype(np.uint8)
        actions = np.stack([np.asarray(it["actions"]) for it in items], axis=0)
        origins = [it.get("origin", "") for it in items]
        return {"frames": frames, "actions": actions, "origin": origins}

    def __iter__(self):
        idx = self._indices()
        n = len(idx)
        batch_starts = range(0, n - self.batch_size + 1, self.batch_size) if self.drop_last \
            else range(0, n, self.batch_size)
        if self.num_workers <= 1:
            for s in batch_starts:
                items = [self.dataset[int(i)] for i in idx[s:s + self.batch_size]]
                yield self._stack(items)
            return
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = collections.deque()
            starts = list(batch_starts)
            DEPTH = 2  # batches in flight

            def submit(s):
                ids = [int(i) for i in idx[s:s + self.batch_size]]
                return [pool.submit(self.dataset.__getitem__, i) for i in ids]

            si = 0
            while si < len(starts) and len(pending) < DEPTH:
                pending.append(submit(starts[si]))
                si += 1
            while pending:
                futs = pending.popleft()
                if si < len(starts):
                    pending.append(submit(starts[si]))
                    si += 1
                yield self._stack([f.result() for f in futs])


def estimate_cache_bytes(dataset, uint8_frames: bool) -> int:
    r"""Device-memory cost of staging ``dataset`` with :class:`HBMCachedLoader`
    (reads ONE item for shapes; assumes homogeneous items, which
    ``set_seq_len`` guarantees)."""
    item = dataset[0]
    frames = np.asarray(item["frames"])
    actions = np.asarray(item["actions"])
    frame_bytes = frames.size * (1 if uint8_frames else frames.dtype.itemsize)
    return len(dataset) * (frame_bytes + actions.nbytes)


@_functools.lru_cache(maxsize=None)
def _cached_gather(sharding):
    r"""Jitted batch gather, cached per output sharding so per-epoch iterator
    re-creation reuses the compiled executable."""
    import jax
    import jax.numpy as jnp

    def take(frames, actions, idx):
        return {"frames": jnp.take(frames, idx, axis=0),
                "actions": jnp.take(actions, idx, axis=0)}

    if sharding is None:
        return jax.jit(take)
    return jax.jit(take, out_shardings={"frames": sharding, "actions": sharding})


class HBMCachedLoader:
    r"""Device-resident cache of a small file-backed dataset.

    The reference streams every epoch through a 4-worker torch DataLoader
    (``vp_suite/vpsuite.py:296-298``); on this 1-core host that caps
    ``VPSuite.train`` at a few hundred frames/s while the chip consumes
    thousands. When the training set fits a device-memory budget, this loader
    reads every item ONCE (threaded, same decode path as
    :class:`BatchLoader`), stacks frames (uint8-quantized exactly like the
    ``uint8_frames`` transfer path — dequantized on device by
    ``VPModel.unpack_data``) and actions, uploads both stacks to device
    memory once, and serves every subsequent batch as a jitted device-side
    row gather. The host's only per-step work is one ``[b]``-int32 index
    transfer; epochs after the first never touch the filesystem.

    With a ``sharding`` (data-parallel mesh), the cache is placed replicated
    and each gathered batch lands already batch-sharded over the mesh
    (``out_shardings``) — no collective traffic, no host resharding.
    """

    def __init__(self, dataset, batch_size, *, uint8_frames=True, sharding=None,
                 drop_last=True, num_workers=4):
        import jax
        n = len(dataset)
        with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
            items = list(pool.map(dataset.__getitem__, range(n)))
        frames = np.stack([np.asarray(it["frames"]) for it in items], axis=0)
        if uint8_frames and frames.dtype != np.uint8:
            frames = np.clip(np.rint(frames * 255.0), 0, 255).astype(np.uint8)
        actions = np.stack([np.asarray(it["actions"]) for it in items], axis=0)
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            replicated = NamedSharding(sharding.mesh, PartitionSpec())
            self._frames = jax.device_put(frames, replicated)
            self._actions = jax.device_put(actions, replicated)
        else:
            self._frames = jax.device_put(frames)
            self._actions = jax.device_put(actions)
        self._gather = _cached_gather(sharding)
        self.nbytes = frames.nbytes + actions.nbytes
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.n = n

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def epoch_iterator(self, seed, shuffle=True):
        r"""Yields device-resident ``{'frames', 'actions'}`` batches for one
        epoch. Dispatches are asynchronous, so gather/train-step pairs
        pipeline on device."""
        import jax
        idx = np.arange(self.n)
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        stop = self.n - self.batch_size + 1 if self.drop_last else self.n
        for s in range(0, stop, self.batch_size):
            ids = np.ascontiguousarray(idx[s:s + self.batch_size])
            if len(ids) < self.batch_size and self.drop_last:
                break
            yield self._gather(self._frames, self._actions,
                               jax.device_put(ids))


def device_prefetch(iterator, sharding=None, depth=2):
    r"""Moves batches to device ahead of consumption (double buffering).

    Args:
        iterator: yields numpy batch dicts.
        sharding: optional ``jax.sharding.Sharding`` for the device placement
            (e.g. batch-sharded over a data mesh axis).
        depth: number of batches resident on device ahead of use.
    """
    import jax
    queue = collections.deque()
    multiprocess = jax.process_count() > 1

    def put(batch):
        arrs = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if sharding is not None and multiprocess:
            # each process contributes its local shard of the global batch;
            # the resulting jax.Array spans all hosts' devices
            placed = {k: jax.make_array_from_process_local_data(sharding, v)
                      for k, v in arrs.items()}
        elif sharding is not None:
            placed = {k: jax.device_put(v, sharding) for k, v in arrs.items()}
        else:
            placed = {k: jax.device_put(v) for k, v in arrs.items()}
        return placed  # non-array metadata (origin) is dropped on device

    it = iter(iterator)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        batch = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield batch
