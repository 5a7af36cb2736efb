"""Device mesh + sharding helpers."""

from ttdg_mgm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
