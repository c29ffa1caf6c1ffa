"""Point-to-node partition and kNN patch extraction (static shapes).

Reimplements reference geotransformer/modules/ops/pointcloud_partition.py:
``point_to_node_partition`` (:61-107) and ``knn_partition`` (:35-57) with the
padding ABI: invalid points/nodes are masked instead of absent, and missing
patch slots carry the sentinel index ``N`` (the point capacity).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rdmnet_tpu.ops.geometry import pairwise_sq_dist

_BIG = 1.0e12


def knn_partition(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    k: int,
    points_mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest valid points for each node (reference :35-57).

    Returns (knn_sq_dists, knn_indices), each (M, k)."""
    sq = pairwise_sq_dist(nodes, points)  # (M, N)
    if points_mask is not None:
        sq = jnp.where(points_mask[None, :], sq, _BIG)
    neg_top, idx = jax.lax.top_k(-sq, k)
    return -neg_top, idx.astype(jnp.int32)


def point_to_node_partition(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    nodes: jnp.ndarray,
    nodes_mask: jnp.ndarray,
    point_limit: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assign each point to its nearest node; per node, keep up to
    ``point_limit`` nearest *owned* points (reference :61-107).

    Args:
      points: (N, 3) padded fine points.
      points_mask: (N,) bool validity of points.
      nodes: (M, 3) padded nodes.
      nodes_mask: (M,) bool validity of nodes (invalid nodes own nothing).
      point_limit: static patch size K.

    Returns:
      point_to_node: (N,) int32 owning node per point (garbage for invalid
        points — mask with points_mask).
      node_masks: (M,) bool — node valid AND owns >= 1 point.
      node_knn_indices: (M, K) int32 into points, sentinel N where missing.
      node_knn_masks: (M, K) bool.
    """
    n = points.shape[0]
    m = nodes.shape[0]

    sq = pairwise_sq_dist(nodes, points)  # (M, N)
    sq = jnp.where(nodes_mask[:, None], sq, _BIG)
    sq = jnp.where(points_mask[None, :], sq, _BIG)

    point_to_node = jnp.argmin(sq, axis=0).astype(jnp.int32)  # (N,)

    # node owns a point <=> some valid point has it as argmin
    owner_onehot = (
        jax.nn.one_hot(point_to_node, m, dtype=jnp.float32)
        * points_mask[:, None].astype(jnp.float32)
    )  # (N, M)
    node_has_point = jnp.sum(owner_onehot, axis=0) > 0
    node_masks = node_has_point & nodes_mask

    # restrict each node's candidates to the points it owns
    matching = (
        (point_to_node[None, :] == jnp.arange(m, dtype=jnp.int32)[:, None])
        & points_mask[None, :]
    )  # (M, N)
    sq_owned = jnp.where(matching, sq, _BIG)
    neg_top, node_knn_indices = jax.lax.top_k(-sq_owned, point_limit)  # (M, K)
    node_knn_masks = neg_top > -_BIG
    node_knn_indices = jnp.where(node_knn_masks, node_knn_indices, n).astype(jnp.int32)

    return point_to_node, node_masks, node_knn_indices, node_knn_masks
