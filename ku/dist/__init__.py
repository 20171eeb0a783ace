"""Distributed training over device meshes (reference analogue: none —
the reference's ``multi_gpu``/``num_gpus`` flags are never used, see
SURVEY §2.5; here DP/TP are first-class)."""

from ku.dist.mesh import (
    initialize_multihost,
    make_mesh,
    data_parallel_sharding,
    replicate,
    cd_epoch_dp,
    shard_gan_state,
    shard_decode_state,
    shard_stacked_batches,
    shard_batch,
)
