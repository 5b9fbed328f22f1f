from vp_suite_tpu.parallel.mesh import (
    make_mesh, replicated_sharding, batch_sharding, shard_params, shard_batch,
    local_device_count)
