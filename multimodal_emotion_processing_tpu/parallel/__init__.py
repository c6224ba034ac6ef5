from .mesh import (  # noqa: F401
    make_mesh, batch_spec, batch_sharding, replicated_sharding,
    tp_param_spec, shard_params, make_sharded_train_step,
    initialize_multihost, process_batch_slice, put_global_batch,
)
