r"""Host-side input pipeline: threaded batch assembly + device prefetch.

TPU-native replacement for the reference's 4-worker torch DataLoader
(``vp_suite/vpsuite.py:296-298``): a thread-pool fetches dataset items in
parallel (numpy/cv2 release the GIL), batches are stacked on host, and a
prefetcher keeps ``prefetch`` batches in flight to the device so the TPU never
waits on input (double buffering host->HBM).
"""
import collections
import concurrent.futures as cf

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
