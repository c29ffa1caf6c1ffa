from rdmnet_tpu.graph.pyramid import (  # noqa: F401
    CloudPyramid,
    PairBatch,
    build_cloud_pyramid,
    build_pair_batch,
)
