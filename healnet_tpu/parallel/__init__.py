from healnet_tpu.parallel.mesh import (
    AXIS_DATA,
    AXIS_MODEL,
    AXIS_SEQ,
    batch_sharding,
    context_sharding,
    data_parallel_mesh,
    make_mesh,
    param_shardings,
    replicated,
    shard_params,
)
from healnet_tpu.parallel.train import (
    batch_shardings,
    init_sharded_state,
    make_sharded_train_step,
    put_batch,
)
from healnet_tpu.parallel.seq_attention import sequence_parallel_attention

__all__ = [
    "AXIS_DATA",
    "AXIS_MODEL",
    "AXIS_SEQ",
    "batch_sharding",
    "context_sharding",
    "data_parallel_mesh",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_params",
    "batch_shardings",
    "init_sharded_state",
    "make_sharded_train_step",
    "put_batch",
    "sequence_parallel_attention",
]
