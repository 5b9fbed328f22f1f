r"""Multi-host (multi-process) training support.

SURVEY.md §5.8: the reference has no distributed execution at all; the
TPU-native equivalent is ``jax.distributed.initialize`` for multi-host slices
plus per-host dataset sharding. Within a slice, the sharding annotations in
``vp_suite_tpu.parallel.mesh`` are unchanged — XLA routes intra-slice
collectives over ICI and inter-slice traffic over DCN.

Usage (one process per host, all started with the same coordinator address):

    from vp_suite_tpu.parallel.distributed import initialize_multihost
    initialize_multihost()            # reads JAX_COORDINATOR_ADDRESS etc.
    suite = VPSuite()                 # global mesh spans all hosts' devices
    ...

Data: give each host its shard of the dataset with
``shard_dataset_for_process`` (index-range sharding; the global batch is
assembled by ``jax.make_array_from_process_local_data`` semantics via the
batch sharding — each host feeds its local devices' portion).
"""
import jax


def initialize_multihost(coordinator_address=None, num_processes=None, process_id=None):
    r"""Initializes the JAX distributed runtime (no-op if single-process or
    already initialized). Arguments default to the JAX_* environment
    variables / TPU metadata autodetection."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise
    return jax.process_index(), jax.process_count()


class ProcessShard:
    r"""A contiguous-stride view of a dataset for one process: item ``i`` maps
    to global index ``i * num_shards + shard_id`` (stride sharding keeps
    shards balanced for ordered datasets)."""

    def __init__(self, dataset, shard_id: int = None, num_shards: int = None):
        self.dataset = dataset
        self.shard_id = jax.process_index() if shard_id is None else shard_id
        self.num_shards = jax.process_count() if num_shards is None else num_shards

    def __len__(self):
        # floor division keeps every process's shard the same length, so all
        # processes take the same number of steps per epoch (collectives in
        # the train step would deadlock otherwise); drops < num_shards items
        return len(self.dataset) // self.num_shards

    def __getitem__(self, i):
        return self.dataset[i * self.num_shards + self.shard_id]

    def __getattr__(self, item):
        return getattr(self.dataset, item)


def shard_dataset_for_process(dataset, shard_id=None, num_shards=None):
    r"""Wraps a dataset so each process sees only its shard of the data."""
    return ProcessShard(dataset, shard_id, num_shards)


def local_batch_size(global_batch_size: int) -> int:
    r"""This process's share of a global batch."""
    count = jax.process_count()
    if global_batch_size % count != 0:
        raise ValueError(f"global batch {global_batch_size} not divisible by "
                         f"{count} processes")
    return global_batch_size // count
