from contrastors_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    data_axis_size,
    shard_map,
    divisor_chunk,
)
