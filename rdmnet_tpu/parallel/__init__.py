from rdmnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate_to_mesh,
    shard_batch,
)
