from rdmnet_tpu.ops.geometry import (  # noqa: F401
    apply_rotation,
    apply_transform,
    get_rotation_translation_from_transform,
    get_transform_from_rotation_translation,
    inverse_transform,
    pairwise_sq_dist,
    rodrigues_rotation,
    skew_symmetric,
    take_padded,
    vector_angle,
)
from rdmnet_tpu.ops.grid_subsample import grid_subsample  # noqa: F401
from rdmnet_tpu.ops.radius_search import radius_knn, radius_knn_banded  # noqa: F401
from rdmnet_tpu.ops.partition import (  # noqa: F401
    knn_partition,
    point_to_node_partition,
)
from rdmnet_tpu.ops.procrustes import weighted_procrustes  # noqa: F401
from rdmnet_tpu.ops.ransac import (  # noqa: F401
    ransac_registration,
    ransac_registration_host,
)
from rdmnet_tpu.ops.nms import greedy_nms  # noqa: F401
from rdmnet_tpu.ops.correspondences import (  # noqa: F401
    correspondence_masks_from_feats,
    correspondence_masks_from_scores,
    correspondence_masks_threshold,
    dense_to_node_correspondences,
    mutual_nearest_node_masks,
    nearest_node_assignment,
    node_correspondence_overlaps,
    node_occlusion_ratios,
    node_overlap_ratios,
    node_pair_overlaps,
    node_to_dense_correspondences,
    radius_correspondence_masks,
    top_k_correspondences,
)
