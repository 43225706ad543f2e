from joeys2t_tpu.parallel.mesh import (  # noqa: F401
    MeshContext,
    get_default_mesh,
    get_mesh,
    replicate,
    set_default_mesh,
    shard_batch_arrays,
    sp_constraint,
)
