"""Non-LGR point matching + radius grouping (parity components).

* ``point_matching``: plain correspondence extraction from per-patch score
  matrices without the local-to-global registration (re-design of reference
  geotransformer/modules/geotransformer/point_matching.py:45-155; unused by
  the default RDMNet forward but part of the capability surface);
* ``group_and_aggregate``: radius-group + masked max-pool feature
  aggregation (reference modules/geotransformer/group_and_aggregate.py:9-40).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rdmnet_tpu.config import FineMatchingConfig
from rdmnet_tpu.ops.lgr import Correspondences, _extract_correspondences
from rdmnet_tpu.ops.radius_search import radius_knn


def point_matching(
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    matching_scores: jnp.ndarray,
    corr_valid: jnp.ndarray,
    cfg: FineMatchingConfig,
) -> Correspondences:
    """Extract dense correspondences (row/col top-1 with dustbin comparison)
    without pose estimation. Same extraction as LGR's first stage."""
    scores = jnp.exp(matching_scores)
    corr, _ = _extract_correspondences(
        scores, ref_knn_points, src_knn_points,
        ref_knn_masks, src_knn_masks, corr_valid, cfg,
    )
    return corr


def group_and_aggregate(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    s_feats: jnp.ndarray,
    s_count: jnp.ndarray,
    radius: float,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Radius-group s_points around each q_point and max-pool their features.

    Returns (q_feats (Q, C), group_sizes (Q,)).
    """
    idx = radius_knn(q_points, s_points, s_count, radius, k)  # (Q, k)
    feats = jnp.take(s_feats, idx, axis=0, mode="fill", fill_value=-jnp.inf)
    valid = idx < s_points.shape[0]
    group_sizes = jnp.sum(valid.astype(jnp.int32), axis=1)
    pooled = jnp.max(feats, axis=1)
    pooled = jnp.where(group_sizes[:, None] > 0, pooled, 0.0)
    return pooled, group_sizes
