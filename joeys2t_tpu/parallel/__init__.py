from joeys2t_tpu.parallel.mesh import (  # noqa: F401
    MeshContext,
    get_mesh,
    replicate,
    shard_batch_arrays,
)
