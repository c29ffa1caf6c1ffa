from rdmnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate_to_mesh,
    shard_batch,
)
from rdmnet_tpu.parallel.sharded_search import sharded_radius_knn  # noqa: F401
