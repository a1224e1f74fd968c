from uvc_tpu.parallel.mesh import (
    make_mesh,
    param_partition_spec,
    shard_params,
    shard_batch,
    replicate,
    initialize_multihost,
)
