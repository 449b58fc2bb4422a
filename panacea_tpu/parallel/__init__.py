from panacea_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    clip_sharding,
    make_mesh,
    replicated,
    shard_batch_dict,
)
